package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the exact Jaccard join pipeline — which of
  * (shingle, prefix ranking, candidate join, verification) dominates at a
  * given SF. Run: `sbt "runMain graft.tools.ProfileJaccard /root/testdata/sf0.1"`. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.cache().count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val threshold = 0.5
    val sh = t("shingleFrame+persist") {
      val s = graft.ops.Dedup.shingleFrame(docs, "doc_id", "text", 3).persist()
      s.count(); s
    }
    val inv = sh.select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val df_ = t("df per shingle") {
      val d = inv.groupBy("shingle").agg(count(lit(1)).as("df")).persist()
      d.count(); d
    }
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("shingle"))
    val prefix = t("prefix rank+filter+persist") {
      val p = inv.join(df_, "shingle")
        .withColumn("rk", row_number().over(wOrd))
        .filter(col("rk") <= col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
        .select(col("id"), col("n_sh"), col("shingle")).persist()
      System.err.println(s"  prefix rows: ${p.count()}")
      p
    }
    val cands = t("candidate join+dedup") {
      val c = prefix.as("x").join(prefix.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id") &&
          col("y.n_sh") >= ceil(lit(threshold) * col("x.n_sh")) &&
          col("x.n_sh") >= ceil(lit(threshold) * col("y.n_sh")))
        .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
        .dropDuplicates("doc_a", "doc_b").persist()
      System.err.println(s"  candidate pairs: ${c.count()}")
      c
    }
    t("verify join (broadcast cands)") {
      val bySh = sh.select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
      val n = broadcast(cands)
        .join(bySh.select(col("id").as("doc_a"), col("sh").as("sha"), col("n_sh").as("na")), "doc_a")
        .join(bySh.select(col("id").as("doc_b"), col("sh").as("shb"), col("n_sh").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          org.apache.spark.sql.graftbridge.ColumnBridge.column(graft.functions.SortedIntersectCount(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sha")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("shb")))).cast("double").as("common"))
        .select(col("doc_a"), col("doc_b"),
          (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold).count()
      System.err.println(s"  final pairs: $n")
    }
    t("verify join (hashed shingles)") {
      val bySh = sh.select(col("id"),
        array_sort(transform(col("sh"), s => xxhash64(s))).as("shh"),
        size(col("sh")).as("n_sh"))
      val n = cands
        .join(bySh.select(col("id").as("doc_a"), col("shh").as("sha"), col("n_sh").as("na")), "doc_a")
        .join(bySh.select(col("id").as("doc_b"), col("shh").as("shb"), col("n_sh").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          size(array_intersect(col("sha"), col("shb"))).cast("double").as("common"))
        .select(col("doc_a"), col("doc_b"),
          (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold).count()
      System.err.println(s"  final pairs: $n")
    }
    t("verify join") {
      val bySh = sh.select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
      val n = cands
        .join(bySh.select(col("id").as("doc_a"), col("sh").as("sha"), col("n_sh").as("na")), "doc_a")
        .join(bySh.select(col("id").as("doc_b"), col("sh").as("shb"), col("n_sh").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          org.apache.spark.sql.graftbridge.ColumnBridge.column(graft.functions.SortedIntersectCount(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sha")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("shb")))).cast("double").as("common"))
        .select(col("doc_a"), col("doc_b"),
          (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold).count()
      System.err.println(s"  final pairs: $n")
    }
    spark.stop()
  }
}
