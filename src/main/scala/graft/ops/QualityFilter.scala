package graft.ops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained linear quality filter over hashing-trick features — the
  * CCNet / GPT-3-style corpus filter (Wenzek et al. 2019; Brown et
  * al. 2020 appendix A): score every document with a logistic model
  * over bag-of-words features and keep the high-probability tail.
  * The feature map is [[TextAnalysis.hashedFeatures]]'s bucket hash
  * (md5-based, no vocabulary fit), so train and score both run
  * without any dictionary broadcast.
  *
  * Scale shapes:
  *  - [[score]] is scan → explode → ONE (id)-keyed map-side-combined
  *    aggregate (the per-token weight lookup is an `element_at` into
  *    a literal array, fused into the scan) → broadcast-free sigmoid.
  *    Weight sums run through exact DECIMAL so the logit is
  *    independent of row order and engine.
  *  - [[train]] assembles one sparse-ish dense vector per doc (ONE
  *    (id, bucket) shuffle + ONE (id) shuffle, both map-side
  *    combined) and hands the distributed optimization to MLlib
  *    LogisticRegression — no custom gradient code, executor-parallel
  *    L-BFGS.
  */
object QualityFilter {

  /** Deterministic literal weight grid for oracle-checked scoring:
    * w(b) = ((b·37 + 11) mod 19 − 9) / 10 ∈ {−0.9 … 0.9} — one
    * decimal digit, so DECIMAL sums are exact on both engines (same
    * construction as [[Similarity.planeComponent]]).
    */
  def gridWeights(numFeatures: Int): Array[Double] =
    Array.tabulate(numFeatures)(b => ((b * 37 + 11) % 19 - 9) / 10.0)

  /** Linear scoring: logit(doc) = bias + Σ_tok w(bucket(tok)), prob =
    * sigmoid(logit). Every input doc gets a row (token-free docs score
    * the bare bias). Returns (id, logit, prob) at full precision —
    * callers round for display.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: Array[Double], bias: Double): DataFrame = {
    val wArr = array(weights.map(lit(_)): _*)
    // r19: exact weight sum via Dec15 (split-once projection + two-long
    // carry aggregate) — bit-identical to the DECIMAL(38,15) sum idiom
    // (Dec15Spec) at ~half the cpu. Domain: |w| ≤ 0.9 per token, so a
    // doc's |Σ| is bounded by its token count — nowhere near 9.2e21.
    val perTok = docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("id"),
        graft.functions.Dec15.dec15_split(element_at(wArr,
          (pmod(Dedup.shingleInt(col("tok")), lit(weights.length.toLong))
            + 1).cast("int"))).as("_w"))
      .groupBy(col("id"))
      .agg(graft.functions.Dec15.dec15_sum_split(col("_w")).as("z"))
    docs.select(col(idCol).as("id"))
      .join(perTok, Seq("id"), "left")
      .select(col("id"),
        (lit(bias) + coalesce(col("z"), lit(0.0))).as("logit"))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
  }

  /** Train the filter on labeled docs (labelCol ∈ {0, 1}; in a real
    * pipeline the positives are a trusted seed corpus, the negatives
    * raw crawl). Returns (weights over numFeatures buckets, bias).
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, numFeatures: Int,
            maxIter: Int = 50, regParam: Double = 1e-4): (Array[Double], Double) = {
    val feats = TextAnalysis.hashedFeatures(docs, idCol, textCol, numFeatures)
      .groupBy(col("id"))
      .agg(map_from_arrays(collect_list(col("bucket")),
        collect_list(col("cnt").cast("double"))).as("m"))
      .select(col("id"), array_to_vector(
        transform(sequence(lit(0), lit(numFeatures - 1)),
          b => coalesce(element_at(col("m"), b), lit(0.0)))).as("features"))
    val labeled = docs.select(col(idCol).as("id"),
        col(labelCol).cast("double").as("label"))
      .join(feats, Seq("id"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFitIntercept(true).setStandardization(false)
      .fit(labeled)
    (m.coefficients.toArray, m.intercept)
  }
}
