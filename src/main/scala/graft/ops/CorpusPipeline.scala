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

  /** The END-TO-END training-set build — every stage a real
    * large-corpus curation step, chained as one lazy plan:
    *
    *   1. [[clean]]: quality + language gate, exact-dedup keep-first;
    *   2. MinHash-LSH near-dup gate
    *      ([[graft.streaming.StreamingOps.nearDupKeepBatch]] losers
    *      removed by anti-join; sub-n-token docs claim no bands and
    *      pass through, same convention as the gate itself);
    *   3. trained-filter scoring ([[QualityFilter.score]]), keep
    *      docs with 6dp-rounded P(quality) >= minProb.
    *
    * Returns (id, lang_pred, n_tokens, n_dups, prob).
    *
    * Scale shape: stage 1's only shuffle is the fingerprint groupBy;
    * stage 2 shuffles on shingle/band content keys over the SURVIVORS
    * only (each gate stage shrinks the data before the next pays for
    * it); stage 3 is one (id)-keyed DECIMAL-exact aggregate. The text
    * re-join after clean() and the anti/score joins are all id-keyed
    * equi-joins — no window, no all-pairs anywhere.
    */
  def trainingSet(docs: DataFrame, idCol: String, textCol: String,
                  minQuality: Double, langs: Seq[String],
                  lrWeights: Array[Double], lrBias: Double,
                  minProb: Double,
                  numHashes: Int = 16, rowsPerBand: Int = 4,
                  n: Int = 3): DataFrame = {
    // consumed three times (gate claims, anti-join spine, score) —
    // one materialization, released by the caller's Pins scope
    val surv = graft.core.Pins.pin(
      clean(docs, idCol, textCol, minQuality, langs)
        .select(col("id"), col("lang_pred"), col("n_tokens"), col("n_dups"))
        .join(docs.select(col(idCol).as("id"), col(textCol).as("text")),
          Seq("id")))
    val losers = graft.streaming.StreamingOps
      .nearDupKeepBatch(surv, "id", "text", numHashes, rowsPerBand, n)
      .filter(col("keep") === 0).select(col("doc_id").as("id"))
    val afterGate = surv.join(losers, Seq("id"), "left_anti")
    afterGate
      .join(QualityFilter.score(afterGate, "id", "text", lrWeights, lrBias)
        .select(col("id"), round(col("prob"), 6).as("prob")), Seq("id"))
      .filter(col("prob") >= minProb)
      .select(col("id"), col("lang_pred"), col("n_tokens"),
        col("n_dups"), col("prob"))
  }
}
