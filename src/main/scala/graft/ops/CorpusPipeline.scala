package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite training-corpus cleaning pipeline — the shape a real
  * 100-TB data-curation job has, built from the operator pack:
  * per-document quality scoring and language ID (scan-fused codegen
  * expressions), a quality/language gate (evaluated in the same scan
  * stage — computed from text, so not a parquet PushedFilter, but no
  * extra pass either), then exact-dedup keep-first.
  *
  * Scale shape: the ONLY shuffle is the dedup groupBy on the content
  * fingerprint (map-side combined, content-keyed); the keeper row and
  * its signals come from min/min_by aggregates — no window, no
  * self-join, no second pass over the corpus.
  */
object CorpusPipeline {

  /** Clean `docs`: keep documents with qualityScore >= minQuality and
    * predicted language in `langs`, then collapse exact duplicates
    * (normalized-content MD5) to the lowest-id representative.
    * Returns (fp, id, quality, lang_pred, n_tokens, n_dups).
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double, langs: Seq[String]): DataFrame = {
    val text: Column = col(textCol)
    val scored = docs.select(col(idCol).as("id"),
      TextAnalysis.qualityScore(text).as("quality"),
      TextAnalysis.predictedLang(text).as("lang_pred"),
      TextAnalysis.fingerprintMd5(text).as("fp"),
      TextAnalysis.tokenCount(text).as("n_tokens"))
    val gated = scored.filter(col("quality") >= minQuality &&
      col("lang_pred").isin(langs: _*))
    gated.groupBy(col("fp")).agg(
      min(col("id")).as("id"),
      min_by(col("quality"), col("id")).as("quality"),
      min_by(col("lang_pred"), col("id")).as("lang_pred"),
      min_by(col("n_tokens"), col("id")).as("n_tokens"),
      count(lit(1)).as("n_dups"))
  }
}
