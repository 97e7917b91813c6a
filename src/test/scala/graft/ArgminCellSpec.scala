package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `argmin_cell` kernel to the literal argmin formulation it
  * replaced in `Similarity.assignCells` (struct array of
  * (-2 v·c + |c|², cell) sorted ascending, first element) — including the
  * tie rule (smallest cell id) and all-NaN rows, and in both the
  * interpreted (eval) and whole-stage-codegen paths. */
class ArgminCellSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def bridge = org.apache.spark.sql.graftbridge.ColumnBridge

  private def kernel(cs: Array[Array[Double]]) =
    bridge.column(graft.functions.ArgminCell(cs, bridge.expression(col("v"))))

  private def literal(cs: Array[Array[Double]]) = {
    val scores = cs.zipWithIndex.map { case (c, i) =>
      val cArr = array(c.map(lit): _*)
      struct((graft.ops.Similarity.dot(col("v"), cArr) * -2.0
        + lit(c.map(x => x * x).sum)).as("d"), lit(i).as("cell"))
    }
    element_at(array_sort(array(scores: _*)), 1)("cell")
  }

  /** Runs `body` once on the genuinely CODEGEN'D path and once on the
    * genuinely INTERPRETED path. Two traps make the naive conf toggle a
    * no-op: ConvertToLocalRelation folds a Project over a local Seq.toDF
    * into driver-side interpreted evaluation at OPTIMIZATION time (no
    * codegen ever runs, whatever the conf says), so the input must be
    * repartitioned to keep a real executed Project; and the eval path
    * needs whole-stage codegen off, not just the projection factory. */
  private def bothPaths(f: (org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame, String) => Unit): Unit = {
    for ((ws, factory) <- Seq(("true", "CODEGEN_ONLY"), ("false", "NO_CODEGEN"))) {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
      try f(df => df.repartition(2), s"wholeStage=$ws/$factory")
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
  }

  test("kernel == literal argmin on random vectors, both codegen and interpreted") {
    val rnd = new scala.util.Random(7)
    val cs = Array.fill(17)(Array.fill(8)(rnd.nextGaussian()))
    val df = (0 until 500).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "v")
    bothPaths { (prep, mode) =>
      val got = prep(df).select(col("id"), kernel(cs).as("k"), literal(cs).as("l"))
        .collect()
      got.foreach(r => assert(r.getInt(1) === r.getInt(2),
        s"id ${r.getLong(0)} [$mode]: kernel ${r.getInt(1)} vs literal ${r.getInt(2)}"))
    }
  }

  test("distance ties resolve to the smallest cell id, like the ascending struct sort") {
    // duplicate centroids: every vector is equidistant to cells 0 and 1;
    // pinned in BOTH paths so neither the eval nor the codegen tie rule
    // can drift alone
    val cs = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.2, 0.8))).toDF("id", "v")
    bothPaths { (prep, mode) =>
      val got = prep(df).select(col("id"), kernel(cs).as("k"), literal(cs).as("l")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
      assert(got.toSeq === Seq((1L, 0, 0), (2L, 2, 2)), s"[$mode]")
    }
  }

  test("NaN components: kernel matches the literal path (all-NaN distances -> cell 0)") {
    val cs = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq((1L, Seq(Double.NaN, 0.5))).toDF("id", "v")
    val got = df.select(kernel(cs).as("k"), literal(cs).as("l")).collect()(0)
    assert(got.getInt(0) === got.getInt(1))
    assert(got.getInt(0) === 0)
  }

  test("shorter vector uses the common prefix, like DotProduct") {
    val cs = Array(Array(1.0, 5.0, 5.0), Array(2.0, 0.0, 0.0))
    // v = [1.9]: prefix dots are 1.9 and 3.8; d0 = -3.8 + 51, d1 = -7.6 + 4
    val df = Seq((1L, Seq(1.9))).toDF("id", "v")
    val got = df.select(kernel(cs).as("k"), literal(cs).as("l")).collect()(0)
    assert(got.getInt(0) === got.getInt(1))
    assert(got.getInt(0) === 1)
  }

  test("NULL vector yields NULL cell") {
    val df = Seq((1L, Option.empty[Seq[Double]])).toDF("id", "v")
    val got = df.select(kernel(Array(Array(1.0))).as("k")).collect()(0)
    assert(got.isNullAt(0))
  }
}
