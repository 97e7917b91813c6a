package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for `Similarity.semanticDedup`: deterministic synthetic
  * embeddings (d=32) at doubling corpus sizes, with the cell count grown
  * proportionally (fixed expected cell size — the SemDeDup deployment
  * shape). Two cost terms to watch:
  *
  *   - assignment: one pass of n × cells × d multiply-adds (argmin over
  *     centroid literals). Grows with n·cells — at cluster scale (say
  *     100k cells) the centroid-literal plan stops being the right tool
  *     and assignment becomes a broadcast centroid-table join, same
  *     arithmetic, no giant plan; noted in SCALE.md, not needed at the
  *     cell counts this harness reaches.
  *   - within-cell pairing: sum over cells of s_c² dot products. With
  *     cell size held constant this is LINEAR in n — the whole point of
  *     clustering before pruning.
  *
  * Run: `sbt "runMain graft.tools.SemDedupStress 10000 20000 40000"`.
  */
object SemDedupStress {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10000, 20000, 40000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 32

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"$name%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    for (n <- ns) {
      // deterministic pseudo-random directions (xxhash64-derived phases, so
      // cross sims concentrate near 0 at d=32 — NOT a one-parameter family
      // like sin(id + cj), where cosine degenerates to cos(id_a - id_b) and
      // everything is everyone's neighbor); every 100th vector is a
      // near-copy of its predecessor (tiny phase perturbation), so the dup
      // count is ~n/100 at every n
      val emb = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j => {
          val srcId = col("id") - when(col("id") % 100 === 1, 1L).otherwise(0L)
          val src = srcId * dim + j.cast("long")
          val phase = pmod(xxhash64(src), lit(6283L)).cast("double") / 1000.0
          sin(phase + when(col("id") % 100 === 1, 0.001).otherwise(0.0))
        }).as("v"))
        .cache()
      emb.count()
      val cells = math.max(1, n / 500)
      System.err.println(s"== n=$n cells=$cells (expected cell size ~500) ==")
      t(s"semanticDedup t=0.99 cells=$cells") {
        val r = graft.ops.Similarity
          .semanticDedup(emb, threshold = 0.99, nCells = cells, iterations = 2)
          .filter(col("is_dup")).count()
        graft.ops.OpCaches.unpersistAll(); r
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
