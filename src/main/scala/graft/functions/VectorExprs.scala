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
  * Output is identical to that chain for null-free element arrays — the
  * only supported input, as produced by `md5(...)` k-gram hashing (OpsSpec
  * proves the equivalence differentially); a window containing only NULL
  * elements is skipped here where the HOF chain emits a NULL fingerprint.
  * n < w → empty array.
  *
  * Codegen'd: `doGenCode` emits a call into the compiled `compute` kernel,
  * so the expression participates in whole-stage codegen. This matters less
  * for the deque itself (a JIT-compiled loop either way) than for its
  * NEIGHBORS: a `CodegenFallback` here would force the whole collapsed
  * projection — including the per-kgram md5 pass that CollapseProject
  * inlines when the hash array is referenced once — into interpreted
  * `InterpretedUnsafeProjection`, the alias-inlining hazard documented in
  * SCALE.md §"Catalyst hazards".
  */
case class WinnowMinima(child: Expression, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

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
  override def eval(input: InternalRow): Any = compute(child.eval(input))

  /** The winnowing kernel; public so generated code can call it. */
  def compute(a: Any): ArrayData = {
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowMinima].getName)
    val arrType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val resultCode =
      code"""
         |${childGen.code}
         |$arrType ${ev.value} =
         |  $ref.compute(${childGen.isNull} ? null : (Object) ${childGen.value});
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_fingerprint(text, k, w) -> array<string>`.
  *
  * FUSED winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * md5 every k-char gram of `text` and keep the distinct sliding-window
  * minima of every w-gram window, in ONE compiled kernel — no intermediate
  * hash array, no per-window slice, no higher-order-function lambda.
  *
  * Why fused: the two-step `transform(sequence(...), i -> md5(substr(...)))`
  * + `winnow_minima` form can never be whole-stage codegen'd — Spark's
  * `ArrayTransform` is itself `CodegenFallback`, and ONE fallback expression
  * ejects the whole collapsed projection from codegen (the r2 q23
  * regression: CollapseProject inlined the md5 pass into the fallback
  * projection → everything interpreted). This expression has a real
  * `doGenCode`, so the projection stays `*(n)`-codegen'd, and the kernel
  * works on raw UTF-8 bytes: code-point offsets computed once, each gram
  * digested straight from the byte buffer (`MessageDigest.update(bytes,
  * from, len)` — zero substring allocation), window minima tracked as
  * 16-byte digests on a monotonic deque, and only the surviving distinct
  * minima hex-encoded at the end.
  *
  * Output semantics — identical to the HOF chain the oracle mirrors
  * (`md5(cast(substr(text, i, k) as binary))` per gram; `array_distinct` of
  * per-window `array_min`, first-occurrence order): hex compare order ==
  * unsigned digest byte order, and substr counts CODE POINTS (handled via
  * the offsets walk), so multi-byte text agrees with Spark/DuckDB substr.
  * NULL text or fewer than k+w-1 code points → empty array.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType if k >= 1 && w >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, k >= 1, w >= 1), got " +
        s"${child.dataType.catalogString} with k=$k w=$w")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "winnow_fingerprint"

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  private[this] val HexDigits = "0123456789abcdef".toCharArray

  /** The fused kernel; public so generated code can call it. */
  def compute(a: Any): ArrayData = {
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    if (a == null) return empty
    val text = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val bytes = text.getBytes
    // byte offset of each code point (+ end sentinel), one UTF-8 walk
    val nBytes = bytes.length
    var nChars = 0
    var p = 0
    val offs = new Array[Int](nBytes + 1)
    while (p < nBytes) {
      offs(nChars) = p
      val b = bytes(p) & 0xFF
      p += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      nChars += 1
    }
    offs(nChars) = nBytes
    if (nChars < k + w - 1) return empty
    val nGrams = nChars - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      digests(i) = md.digest() // digest() resets the instance
      i += 1
    }
    // monotonic deque of gram indices; unsigned byte compare == hex order
    def cmp(x: Array[Byte], y: Array[Byte]): Int = {
      var j = 0
      while (j < 16) {
        val d = (x(j) & 0xFF) - (y(j) & 0xFF)
        if (d != 0) return d
        j += 1
      }
      0
    }
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    var lastEmitted = -1 // gram index of the last window's min (skip re-adds)
    val out = new java.util.LinkedHashSet[java.nio.ByteBuffer]()
    i = 0
    while (i < nGrams) {
      while (tail > head && cmp(digests(deque(tail - 1)), digests(i)) >= 0) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1 && deque(head) != lastEmitted) {
        lastEmitted = deque(head)
        out.add(java.nio.ByteBuffer.wrap(digests(lastEmitted)))
      }
      i += 1
    }
    val res = new Array[AnyRef](out.size)
    val it = out.iterator()
    var r = 0
    while (it.hasNext) {
      val dg = it.next().array()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((dg(j) >> 4) & 0xF).toByte
        hex(2 * j + 1) = HexDigits(dg(j) & 0xF).toByte
        j += 1
      }
      res(r) = org.apache.spark.unsafe.types.UTF8String.fromBytes(hex)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("winnowFp", this, classOf[WinnowFingerprint].getName)
    val arrType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val resultCode =
      code"""
         |${childGen.code}
         |$arrType ${ev.value} =
         |  $ref.compute(${childGen.isNull} ? null : (Object) ${childGen.value});
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
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

/** `argmin_cell(<centroid matrix>, array<double>) -> int`.
  *
  * Nearest-centroid assignment as ONE plan node: the centroid matrix rides
  * the expression (plan-serialized once, a reference object in codegen)
  * instead of expanding to nCells × dim literal nodes + a per-row
  * `array_sort` over nCells structs. Arithmetic is exactly the literal
  * formulation it replaces (`Similarity.assignCells`): per cell,
  * d = dot(v, c) * -2.0 + |c|² with a sequential left-to-right dot
  * (`DotProduct`'s order), argmin with ties to the SMALLEST cell id
  * (strict `<` keeps the earlier cell, matching ascending struct sort on
  * (d, cell)) — so assignments, and therefore every IVF/semantic-dedup
  * result built on them, are bit-identical to the literal path
  * (ArgminCellSpec pins this, ties and NaN included). Beyond removing the
  * per-row sort/alloc, this is what keeps large cell counts viable: the
  * plan no longer grows with nCells, only the broadcast-style reference
  * object does.
  */
case class ArgminCell(matrix: Array[Array[Double]], child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(matrix.nonEmpty, "argmin_cell needs at least one centroid")

  private lazy val sumsq: Array[Double] =
    matrix.map(row => row.foldLeft(0.0)((s, x) => s + x * x))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "argmin_cell"
  override def toString: String = s"argmin_cell(${matrix.length} cells, $child)"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    var best = Double.PositiveInfinity
    var bestC = 0
    var c = 0
    while (c < matrix.length) {
      val row = matrix(c)
      val n = math.min(v.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
      val d = s * -2.0 + sumsq(c)
      if (d < best) { best = d; bestC = c }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("centroids", matrix, "double[][]")
      val sq = ctx.addReferenceObj("sumsq", sumsq, "double[]")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestC = 0;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  double[] $row = $m[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $row[$i];
         |  }
         |  double $d = $s * -2.0 + $sq[$c];
         |  if ($d < $best) { $best = $d; $bestC = $c; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
