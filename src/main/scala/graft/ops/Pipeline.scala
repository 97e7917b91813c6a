package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline: near-dup removal (keep the
  * minimum-id representative of every duplicate cluster) followed by
  * language and quality gating — the end-to-end shape of a corpus-prep job,
  * built entirely from the operators in this package.
  *
  * Scale shape: one similarity join (sketch-keyed equi-joins, see Dedup),
  * one label-propagation pass over the (tiny) dup-pair graph, one broadcast
  * anti-join of representatives-to-drop against the corpus, and a codegen'd
  * scoring projection. The corpus is never self-joined row-by-row.
  */
object Pipeline {

  /** Writes a curated corpus PARTITIONED BY detected language — the
    * standard training-data layout: downstream jobs that read one language
    * (`.filter(col("lang_guess") === "en")`) prune every other language's
    * files at the listing, and per-language file sizes stay balanced
    * because the partition column has low cardinality. Read back with
    * `spark.read.parquet(path)`. */
  def writeCuratedByLang(curated: DataFrame, path: String): Unit =
    curated.write.mode("overwrite").partitionBy("lang_guess").parquet(path)

  /** Curate `docs`: drop non-representative near-duplicates (exact n-gram
    * Jaccard >= dupThreshold, min-id representative kept), then keep rows
    * with qualityScore >= minQuality. Output: doc_id, lang_guess, quality,
    * n_tokens. */
  def curate(docs: DataFrame, dupThreshold: Double = 0.5,
      minQuality: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pairs = Dedup.jaccardJoin(docs, dupThreshold, idCol = idCol, textCol = textCol)
    val comps = Dedup.dupComponents(pairs)
    // every id in `comps` with component != id is a non-representative dup
    val drop = comps.filter(col("component") =!= col("id")).select(col("id"))
    docs.join(broadcast(drop), docs(idCol) === drop("id"), "left_anti")
      .select(col(idCol),
        TextAnalysis.langId(col(textCol)).as("lang_guess"),
        round(TextAnalysis.qualityScore(col(textCol)), 6).as("quality"),
        size(TextAnalysis.tokensWs(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("quality") >= minQuality)
  }
}
