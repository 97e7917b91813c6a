package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the exact Jaccard join pipeline — which of
  * (shingle+hash, df count, prefix ranking, candidate join, verification)
  * dominates at a given SF. Mirrors the CURRENT `Dedup.jaccardJoinImpl`
  * shapes (hashed inverted index, hash-aggregate prefix ranking, two-stage
  * verification). Run:
  * `sbt "runMain graft.tools.ProfileJaccard /root/testdata/sf0.1"`. */
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
    // --- stage 1: tokenize + shingle + hash + sort, cached (mirrors
    // materialize(shingleFrameHashed(...)))
    val sh = t("shingleFrameHashed+persist") {
      val s = graft.ops.Dedup.shingleFrame(docs, "doc_id", "text", 3)
        .select(col("id"), col("sh"),
          array_sort(transform(col("sh"), x => xxhash64(x))).as("shh"),
          size(col("sh")).as("n_sh"))
        .persist()
      s.count(); s
    }
    val inv = sh.select(col("id"), col("n_sh"), explode(col("shh")).as("shingle"))
    // --- stage 2: per-shingle document frequency
    val df_ = t("df per shingle") {
      val d = inv.groupBy("shingle").agg(count(lit(1)).as("df")).persist()
      d.count(); d
    }
    // --- stage 3: prefix ranking (hash aggregate: collect + local sort +
    // slice), as the small-doc branch of jaccardJoinImpl does
    val prefixLen =
      (col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1).cast("int")
    val prefix = t("prefix rank (hash agg)") {
      val p = inv.join(df_, "shingle")
        .groupBy(col("id"))
        .agg(first(col("n_sh")).as("n_sh"),
          sort_array(collect_list(struct(col("df"), col("shingle")))).as("ps"))
        .select(col("id"), col("n_sh"),
          posexplode(slice(col("ps"), lit(1), prefixLen)))
        .select(col("id"), col("n_sh"), col("col.shingle").as("shingle"),
          (col("pos") + 1).as("pos"))
        .persist()
      System.err.println(s"  prefix rows: ${p.count()}")
      p
    }
    // --- stage 4: candidate self-join + pair dedup
    val cands = t("candidate join+dedup") {
      val xIsShorter = col("x.n_sh") < col("y.n_sh") ||
        (col("x.n_sh") === col("y.n_sh") && col("x.id") < col("y.id"))
      val idxPrefixLen = col("x.n_sh") -
        ceil(lit(2 * threshold / (1 + threshold)) * col("x.n_sh")) + 1
      val c = prefix.as("x").join(prefix.as("y"),
          col("x.shingle") === col("y.shingle") && xIsShorter &&
          col("x.pos") <= idxPrefixLen &&
          col("x.n_sh") >= ceil(lit(threshold) * col("y.n_sh")) &&
          least(col("x.pos"), col("y.pos")) +
          least(col("x.n_sh") - col("x.pos"), col("y.n_sh") - col("y.pos"))
          >= ceil(lit(threshold / (1 + threshold)) * (col("x.n_sh") + col("y.n_sh"))))
        .select(least(col("x.id"), col("y.id")).as("doc_a"),
          greatest(col("x.id"), col("y.id")).as("doc_b"))
        .dropDuplicates("doc_a", "doc_b").persist()
      System.err.println(s"  candidate pairs: ${c.count()}")
      c
    }
    // --- stage 5: two-stage verification off the cached hash/string arrays
    t("verify (hashed + string)") {
      val byHash = sh.select(col("id"), col("shh"), col("n_sh"))
      val passed = cands
        .join(byHash.select(col("id").as("doc_a"), col("shh").as("ha"), col("n_sh").as("na")), "doc_a")
        .join(byHash.select(col("id").as("doc_b"), col("shh").as("hb"), col("n_sh").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            graft.functions.SortedIntersectCountLong(
              org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ha")),
              org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("hb"))))
            .cast("double").as("common"))
        .filter(col("common") / (col("na") + col("nb") - col("common")) >= threshold)
        .select(col("doc_a"), col("doc_b"))
      val bySh = sh.select(col("id"), col("sh"), col("n_sh"))
      val n = passed
        .join(bySh.select(col("id").as("doc_a"), col("sh").as("sha"), col("n_sh").as("na")), "doc_a")
        .join(bySh.select(col("id").as("doc_b"), col("sh").as("shb"), col("n_sh").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            graft.functions.SortedIntersectCount(
              org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sha")),
              org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("shb"))))
            .cast("double").as("common"))
        .select(col("doc_a"), col("doc_b"),
          (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= threshold).count()
      System.err.println(s"  final pairs: $n")
    }
    spark.stop()
  }
}
