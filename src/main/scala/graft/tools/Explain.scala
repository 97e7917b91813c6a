package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected SparkEntry queries — the
  * plan-review loop (pushdown, pruning, aggregate choice, join strategy). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty && !args(0).startsWith("q")) args(0)
      else "/root/testdata/sf0.001"
    val names = args.filter(_.startsWith("q")) match {
      case Array() => Array("q01_sessionize", "q03_window_funnel", "q09_tpch_q1",
        "q10_join_revenue", "q18_jaccard_dups", "q20_embed_neardup")
      case xs => xs
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n######## $n ########")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
