package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_product(array<double>, array<double>) -> double`.
  *
  * A native codegen'd Catalyst expression: the generated code is a tight
  * primitive loop over the two UnsafeArrayData buffers — no per-element
  * lambda dispatch, no intermediate array allocation. Replaces the
  * `aggregate(zip_with(a, b, *), ...)` higher-order-function chain in the
  * similarity operators (~10× on 64-dim embeddings).
  *
  * Summation is sequential left-to-right, the same order as the HOF chain
  * and as DuckDB's `list_dot_product`, so results are bit-identical to the
  * oracle. Null elements inside the arrays are not expected (embedding
  * columns); length mismatch uses the shorter prefix.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `sorted_intersect_count(array<string>, array<string>) -> int`.
  *
  * Intersection cardinality of two LEXICOGRAPHICALLY SORTED string arrays
  * via a two-pointer merge — no per-call hash set, no intermediate array.
  * This is the verification kernel of the similarity joins: candidates
  * arrive with their (pre-sorted, distinct) shingle arrays and only the
  * overlap count is needed. ~10× over `size(array_intersect(a, b))` on
  * ~50-element arrays. Inputs MUST be sorted and duplicate-free (as
  * produced by `array_sort(array_distinct(...))`); output is undefined
  * otherwise.
  */
/** `sorted_intersect_count_long(array<long>, array<long>) -> int` —
  * two-pointer merge intersection count over SORTED long arrays (the hashed
  * twin of `sorted_intersect_count`; multiset semantics if duplicates).
  * Verification stage 1 of the similarity joins runs on 8-byte shingle
  * hashes instead of strings: collisions can only INCREASE the count, so a
  * threshold pass-set is a superset of the true pass-set and the exact
  * string re-verify on survivors loses nothing. */
case class SortedIntersectCountLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `winnow_minima(array<string>, w) -> array<string>`.
  *
  * Distinct sliding-window minima (first-occurrence order) over a hash
  * array — the windowing half of winnowing fingerprints
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03). A monotonic deque gives O(n)
  * amortized comparisons and ZERO per-window allocation, replacing the
  * `array_distinct(transform(sequence, j -> array_min(slice(h, j, w))))`
  * higher-order chain that allocates a w-element array per window.
  * Output is identical to that chain (OpsSpec proves it differentially):
  * n < w → empty array.
  *
  * Interpreted eval (CodegenFallback): the surrounding md5 projection stays
  * codegen'd in its own stage, and the deque loop is already branch-lean.
  */
case class WinnowMinima(child: Expression, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) if w >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, window >= 1), got " +
        s"${child.dataType.catalogString} with window $w")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "winnow_minima"

  // NULL array → empty fingerprints (the pre-expression formulation's
  // `when(...).otherwise(array())` also mapped NULL input to []); NULL
  // elements are skipped like `array_min` skips them. Overrides eval (not
  // nullSafeEval) to own both rules.
  override def eval(input: InternalRow): Any = {
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val a = child.eval(input)
    if (a == null) return empty
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return empty
    val vals = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      vals(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // active non-null indices [head, tail), values increasing
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    i = 0
    while (i < n) {
      if (vals(i) != null) {
        while (tail > head && vals(deque(tail - 1)).compareTo(vals(i)) >= 0) tail -= 1
        deque(tail) = i; tail += 1
      }
      while (tail > head && deque(head) <= i - w) head += 1
      if (i >= w - 1 && tail > head) out.add(vals(deque(head)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
