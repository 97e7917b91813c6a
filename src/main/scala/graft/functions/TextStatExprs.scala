package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `ngram_repetition(tokens array<string>, n) ->
  * struct<top_share: double, dup_frac: double>`
  *
  * Gopher-style repetition signals over a document's word n-grams, fused
  * into one native codegen'd kernel:
  *   - `top_share` — occurrences of the single most frequent n-gram divided
  *     by the total n-gram count (the "fraction of the doc that is one
  *     repeated phrase" signal);
  *   - `dup_frac`  — `1 - distinct/total` n-grams (the "how much of the doc
  *     repeats anything" signal).
  *
  * Semantics are defined on SPACE-JOINED grams (`tok_i ' ' tok_i+1 …`),
  * exactly the `toks[i] || ' ' || toks[i+1]` form a SQL oracle builds —
  * unambiguous because whitespace tokenization yields space-free tokens.
  * The kernel never materializes the joined strings: grams are grouped by
  * a hash of the token span with an exact token-by-token equality check on
  * collision, so the result is exact, allocation-light, and one pass.
  *
  * Fewer than n tokens (no grams) → NULL struct. A plain-Spark equivalent
  * (explode + two groupBys) would shuffle every gram of every document;
  * this is a per-row map that stays inside whole-stage codegen — the same
  * no-shuffle shape as the rest of the text-analysis family.
  *
  * Reference scope note: repetition scoring is an LLM-pipeline extension
  * (BASELINE.json north star), not part of the reference's seven-function
  * surface.
  */
case class NgramRepetition(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, n >= 1), got " +
        s"${child.dataType.catalogString} with n=$n")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_share", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_repetition"

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  /** The fused kernel; public so generated code can call it. Returns null
    * when the document has no n-grams. */
  def compute(a: Any): InternalRow = {
    if (a == null) return null
    val toks = a.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val m = nTok - n + 1
    if (m <= 0) return null
    // the open-addressed table holds 2m..4m int slots; beyond ~2^29 grams
    // `m * 4` overflows int. No real document gets near that (a 512M-token
    // doc), so fail fast rather than probe a negative-capacity table.
    require(m <= (1 << 29) - 1,
      s"$prettyName supports at most ${(1 << 29) - 1} grams per document, got $m")
    // group gram spans [i, i+n) by hash; exact span equality on collision.
    // open addressing over gram start indices: slots hold (startIdx+1) so 0
    // means empty; counts parallel the slots.
    val cap = java.lang.Integer.highestOneBit(m * 4 - 1) << 1 // >= 2m, pow2
    val slots = new Array[Int](cap)
    val counts = new Array[Int](cap)
    val hashes = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      // per-token hash once; gram hash mixes the n token hashes.
      // A null element (the input type allows containsNull) hashes to a
      // sentinel and compares equal only to another null in gramEq — the
      // same "null is one distinct value" semantics a SQL GROUP BY gives
      // the space-joined oracle form.
      hashes(i) =
        if (toks.isNullAt(i)) -2401053088876216593L // sentinel, any fixed odd
        else toks.getUTF8String(i).hashCode().toLong
      i += 1
    }
    def gramHash(s: Int): Long = {
      var h = 1125899906842597L
      var j = 0
      while (j < n) { h = h * 31 + hashes(s + j); j += 1 }
      h
    }
    def gramEq(s1: Int, s2: Int): Boolean = {
      var j = 0
      while (j < n) {
        val n1 = toks.isNullAt(s1 + j)
        val n2 = toks.isNullAt(s2 + j)
        if (n1 != n2) return false
        if (!n1 &&
            !toks.getUTF8String(s1 + j).equals(toks.getUTF8String(s2 + j)))
          return false
        j += 1
      }
      true
    }
    var distinct = 0
    var top = 0
    i = 0
    while (i < m) {
      var slot = (gramHash(i) & (cap - 1)).toInt
      var placed = false
      while (!placed) {
        val s = slots(slot)
        if (s == 0) {
          slots(slot) = i + 1
          counts(slot) = 1
          distinct += 1
          if (top < 1) top = 1
          placed = true
        } else if (gramEq(s - 1, i)) {
          counts(slot) += 1
          if (counts(slot) > top) top = counts(slot)
          placed = true
        } else {
          slot = (slot + 1) & (cap - 1)
        }
      }
      i += 1
    }
    val total = m.toDouble
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](top / total, 1.0 - distinct / total))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("ngramRep", this, classOf[NgramRepetition].getName)
    val rowType = "org.apache.spark.sql.catalyst.InternalRow"
    val resultCode =
      code"""
         |${childGen.code}
         |$rowType ${ev.value} =
         |  $ref.compute(${childGen.isNull} ? null : (Object) ${childGen.value});
         |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
