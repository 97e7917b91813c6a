package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row SKETCH kernels. A document's MinHash signature / SimHash
  * fingerprint depends only on that document's own shingles/tokens, so the
  * architecturally right shape is a projection expression — one compiled
  * pass per row, NO shuffle — not the explode → groupBy(id) → N-column
  * aggregate formulation (which shuffles the entire exploded inverted index
  * just to regroup rows that were never apart). At 100 TB the difference is
  * an exchange of every (doc, shingle) pair vs zero exchanges.
  *
  * All three expressions are bit-identical to the DataFrame formulations
  * they replace (proven differentially in SketchExprsSpec): the hash family
  * is Spark's own XXH64 (`XXH64.hashLong` == `XxHash64` over a LongType
  * child; `XXH64.hashUTF8String(_, 42)` == `functions.xxhash64` on a
  * string), and the md5 variant reproduces the exact nibble/vote layout of
  * the SQL-mirrorable oracle (see Dedup.simhashMd5).
  */

/** `minhash_signature(array<long>, numHashes) -> array<long>`.
  *
  * out[s] = min over elements h of XXH64.hashLong(h, seed = s) — the same
  * min-wise family as seeding Spark's XxHash64 over the 8-byte shingle
  * hashes, computed for all seeds in one pass over the array. NULL or
  * empty input → NULL (a document with no shingles has no signature, like
  * the explode-based formulation that simply emitted no rows for it).
  * Signed `<` matches the `min` aggregate's LongType ordering.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, numHashes >= 1), got " +
        s"${child.dataType.catalogString} with numHashes=$numHashes")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  /** The signature kernel; public so generated code can call it. */
  def compute(a: Any): ArrayData = {
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var s = 0
      while (s < numHashes) {
        val v = XXH64.hashLong(h, s.toLong)
        if (v < out(s)) out(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSignature].getName)
    val arrType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val resultCode =
      code"""
         |${childGen.code}
         |$arrType ${ev.value} =
         |  $ref.compute(${childGen.isNull} ? null : (Object) ${childGen.value});
         |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(array<string>) -> bigint`.
  *
  * 64-bit SimHash over the DISTINCT tokens of the array: each distinct
  * token's `xxhash64` (seed 42, Spark's default — bit-identical to
  * `functions.xxhash64`) votes ±1 on every bit; bit b of the fingerprint is
  * 1 iff the vote sum is positive. One pass, no explode, no 64-column
  * aggregate. NULL or empty input → NULL (no tokens, no fingerprint);
  * NULL elements are skipped (whitespace tokenizers never produce them).
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  /** The fingerprint kernel; public so generated code can call it.
    * Boxed Long return so generated code can null-check. */
  def compute(a: Any): java.lang.Long = {
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (seen.add(t)) {
          val h = XXH64.hashUTF8String(t, 42L)
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    if (seen.isEmpty) return null // all-null elements: no votes cast
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("simhash64", this, classOf[Simhash64].getName)
    val boxed = ctx.freshName("boxed")
    val resultCode =
      code"""
         |${childGen.code}
         |java.lang.Long $boxed =
         |  $ref.compute(${childGen.isNull} ? null : (Object) ${childGen.value});
         |boolean ${ev.isNull} = $boxed == null;
         |long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash_md5_hex(array<string>) -> string` — the oracle-reproducible
  * SimHash variant as a single per-row kernel.
  *
  * For each DISTINCT token, the per-token 64-bit hash is the first 16 hex
  * chars of md5(token) (= the first 8 digest bytes); hex char j (1-based)
  * of the OUTPUT is the majority vote over the tokens' j-th nibbles, bit p
  * of char j voted by `(nibble_j >> p) & 1`. Exactly the layout of
  * Dedup.simhashMd5's SQL twin (conv(substring(md5(t), j, 1), 16, 10) and
  * per-(j, p) ±1 sums), so an independent ANSI-SQL engine reproduces the
  * fingerprint bit-for-bit. NULL/empty input → NULL; NULL elements skipped.
  */
case class SimhashMd5Hex(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_md5_hex"

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  private[this] val HexDigits = "0123456789abcdef".toCharArray

  /** The fingerprint kernel; public so generated code can call it. */
  def compute(a: Any): UTF8String = {
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[UTF8String]()
    // votes(4*j + p): vote sum for bit p of output nibble j (j = 0..15)
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (seen.add(t)) {
          val digest = md.digest(t.getBytes) // resets the instance
          var j = 0
          while (j < 16) {
            val byte = digest(j >> 1) & 0xFF
            // hex char j+1 of md5 hex: high nibble for even j, low for odd
            val nib = if ((j & 1) == 0) byte >>> 4 else byte & 0xF
            var p = 0
            while (p < 4) {
              votes(4 * j + p) += (if (((nib >> p) & 1) == 1) 1 else -1)
              p += 1
            }
            j += 1
          }
        }
      }
      i += 1
    }
    if (seen.isEmpty) return null
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      var nib = 0
      var p = 0
      while (p < 4) {
        if (votes(4 * j + p) > 0) nib |= 1 << p
        p += 1
      }
      out(j) = HexDigits(nib).toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("simhashMd5", this, classOf[SimhashMd5Hex].getName)
    val resultCode =
      code"""
         |${childGen.code}
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
         |  $ref.compute(${childGen.isNull} ? null : (Object) ${childGen.value});
         |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_might_contain_broadcast(broadcast bits, hash) -> boolean`.
  *
  * Same test as Spark's `BloomFilterMightContain`, but the serialized
  * filter travels as a BROADCAST VARIABLE instead of a plan literal. The
  * literal shape is right for small filters (and is what
  * `Pipeline.decontaminateBloom` uses below its size threshold), but a
  * large filter embedded as a literal is held on the driver inside the
  * expression tree, byte-compared during plan canonicalization, and
  * serialized into every stage's task binary — ~1.2 GB at the 10⁹-gram /
  * 1% fpp design point. A broadcast ships the bits once per executor over
  * the torrent protocol and the plan carries only the handle.
  *
  * The filter deserializes ONCE PER EXECUTOR JVM: the expression instance
  * itself is deserialized per task (it rides the task binary's reference
  * array), so a per-instance lazy val would pay the multi-100MB
  * `BloomFilter.readFrom` per task — the deserialized filter is instead
  * cached process-globally by broadcast id. NULL hash → NULL, matching
  * `BloomFilterMightContain`.
  */
object BloomMightContainBroadcast {
  private val MaxCached = 8

  // True LRU (access-order LinkedHashMap), evicting only the
  // least-recently-probed filter instead of dropping the whole map. Keyed
  // per-context AND per-broadcast: broadcast ids are a per-SparkContext
  // counter starting at 0, so after a stop/start in the same JVM a reused
  // id must not alias the previous context's filter (wrong membership).
  private val cache = new java.util.LinkedHashMap[
      String, org.apache.spark.util.sketch.BloomFilter](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, org.apache.spark.util.sketch.BloomFilter]): Boolean =
      size() > MaxCached
  }

  private def contextKey: String =
    Option(org.apache.spark.SparkEnv.get)
      .flatMap(env => scala.util.Try(env.conf.getAppId).toOption)
      .getOrElse("no-app")

  private[functions] def filterFor(
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]]): org.apache.spark.util.sketch.BloomFilter = {
    val key = s"$contextKey:${bc.id}"
    // the whole lookup-or-deserialize runs under the cache lock so the
    // multi-100MB readFrom happens ONCE per executor JVM even when a
    // stage's tasks all arrive at a cold cache together; cross-filter
    // blocking during that window is rare (sessions seldom probe two
    // distinct large filters at the same instant) and benign
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bc.value))
        cache.put(key, f)
        f
      }
    }
  }
}

case class BloomMightContainBroadcast(
    bits: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash child, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain_broadcast"

  @transient private lazy val filter = BloomMightContainBroadcast.filterFor(bits)

  /** The membership probe; public so generated code can call it. */
  def mightContain(h: Long): Boolean = filter.mightContainLong(h)

  override def eval(input: InternalRow): Any = {
    val h = child.eval(input)
    if (h == null) null else mightContain(h.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bloomBc", this,
      classOf[BloomMightContainBroadcast].getName)
    val resultCode =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = ${childGen.isNull};
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $ref.mightContain(${childGen.value});
         |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
