package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the similarity-join pipeline: multiplies the sf0.1
  * documents corpus m× (each copy's tokens are prefixed with a copy marker,
  * so copies share NO shingles — corpus grows m× while per-shingle document
  * frequency stays flat, the web-corpus growth shape) and times
  * jaccardJoin / minhashLshJoin / dupComponents at each m.
  *
  * What linear-ish wall-time growth demonstrates: candidate generation
  * costs sum-over-shingles(df²), not n² — growing the corpus without
  * growing df must not superlinearly grow the join. Run:
  * `sbt "runMain graft.tools.DedupStress 1 2 4"`.
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val ms = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val nBase = base.count()

    def corpus(m: Int) = {
      val copies = (0 until m).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          // prefix every token with the copy marker: copies share no shingles
          regexp_replace(col("text"), "(\\S+)", s"c$i$$1").as("text"))
      }
      copies.reduce(_.union(_))
    }

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    for (m <- ms) {
      val docs = corpus(m).cache()
      docs.count()
      System.err.println(s"== m=$m (${nBase * m} docs) ==")
      t(s"jaccardJoin t=0.5") {
        val r = graft.ops.Dedup.jaccardJoin(docs, threshold = 0.5).count()
        graft.ops.OpCaches.unpersistAll(); r
      }
      t(s"minhashLshJoin t=0.8") {
        val r = graft.ops.Dedup.minhashLshJoin(docs, threshold = 0.8).count()
        graft.ops.OpCaches.unpersistAll(); r
      }
      t(s"jaccard+components") {
        val pairs = graft.ops.Dedup.jaccardJoin(docs, threshold = 0.5)
        val r = graft.ops.Dedup.dupComponents(pairs).count()
        graft.ops.OpCaches.unpersistAll(); r
      }
      t(s"boilerplateStats minDocs=25") {
        val r = graft.ops.Dedup.boilerplateStats(docs, minDocs = 25).count()
        graft.ops.OpCaches.unpersistAll(); r
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
