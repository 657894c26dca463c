package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its hashed
  * bag-of-words is under a TARGET-domain model than under the raw
  * model, then keep the top-k — the published recipe for carving a
  * target-like training subset out of a web-scale corpus.
  *
  * Both "models" are just counts over `numBuckets` hashed features
  * (the same md5 hashing trick as `TextAnalysis.hashedFeatures`), so
  * fitting is two map-side-combined aggregations onto a bounded key
  * space and scoring is ONE bucket-keyed broadcast join — no
  * driver-side vocabulary, no per-document model state. 100-TB shape:
  * the λ table is ≤ numBuckets rows (broadcast), the per-doc term sum
  * shuffles on doc id with map-side combine, and the top-k is a
  * TakeOrdered.
  *
  * Determinism contract: each bucket's log-likelihood ratio
  * λ_b = ln((ct_b+1)·(Nr+B) / ((cr_b+1)·(Nt+B))) is rounded to 9dp
  * ONCE (single ln of an exactly-representable integer ratio), and
  * per-doc accumulation runs in DECIMAL(38,12) over cnt·λ_b products
  * of exact operands — order-independent, so the DuckDB oracle replays
  * it bit-for-bit under any row order.
  */
object Dsir {

  /** (id, n_feat, log_w): add-one-smoothed importance log-weight of
    * every `raw` document against the `target` corpus.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, numBuckets: Int): DataFrame = {
    require(numBuckets > 0)
    val b = lit(numBuckets.toLong)
    // (id, bucket, cnt) hashed unigram counts per raw document
    val feats = TextAnalysis.hashedFeatures(raw, idCol, textCol, numBuckets)
    val rawCnt = feats.groupBy(col("bucket")).agg(sum(col("cnt")).as("cr"))
    val tgtCnt = target
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(pmod(Dedup.shingleInt(col("tok")), b).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val nr = rawCnt.agg(sum(col("cr")).as("nr"))
    val nt = tgtCnt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    // λ per bucket that OCCURS in raw (only those are ever joined);
    // buckets absent from target get ct = 0 (pure smoothing mass)
    val lam = rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .withColumn("nr", nr.scalar()).withColumn("nt", nt.scalar())
      .select(col("bucket"),
        round(log(
          ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double")
            * (col("nr") + b).cast("double"))
          / ((col("cr") + lit(1L)).cast("double")
            * (col("nt") + b).cast("double"))), 9)
          .cast(DecimalType(20, 9)).as("lam"))
    // the 6dp cut happens in DECIMAL space via round() — HALF_UP in
    // Spark, ties-away in DuckDB, identical on every value — NOT on
    // the double (the exact 9dp sum CAN land on a 6dp midpoint;
    // observed -6.1911365) and NOT via a decimal downscale CAST
    // (DuckDB's decimal→decimal cast TRUNCATES toward zero)
    // cnt as DECIMAL(9,0): the product type is then DECIMAL(30,9) —
    // EXACT. At DECIMAL(18,0) Spark's product precision 18+20+1 = 39
    // overflows 38 and the planner silently drops the scale to 8,
    // rounding every term by up to 5e-10 (observed: doc 109 off by
    // 1e-6 after summation)
    feats.join(broadcast(lam), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("cnt")).as("n_feat"),
        round(sum((col("cnt").cast(DecimalType(9, 0)) * col("lam"))
          .cast(DecimalType(38, 12))), 6).cast("double").as("log_w"))
  }

  /** [[importanceWeights]] + deterministic resample: sel = 1 for the
    * top-k documents by (log_w desc, id asc). The rank-deterministic
    * form of the paper's selection; [[selectGumbel]] is the sampled
    * flavor.
    */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
             textCol: String, numBuckets: Int, k: Int): DataFrame = {
    // pinned: both the top-k branch and the join spine consume the
    // weight table — unpinned, the two-corpus importance pipeline
    // would execute once per branch
    val w = graft.core.Pins.pin(
      importanceWeights(raw, target, idCol, textCol, numBuckets))
    val top = w.orderBy(col("log_w").desc, col("id")).limit(k)
      .select(col("id"))
    w.join(top.withColumn("sel", lit(1)), Seq("id"), "left")
      .select(col("id"), col("n_feat"), col("log_w"),
        coalesce(col("sel"), lit(0)).as("sel"))
  }

  /** 2^60 as an exact double — the uniform's denominator, shared with
    * the oracle SQL literal.
    */
  val GumbelDen: Double = (1L << 60).toDouble

  /** The paper's actual resampling: sample k WITHOUT replacement with
    * probability ∝ w via the Gumbel-top-k identity — key_i = log w_i +
    * G_i with G_i = −ln(−ln(u_i)) standard Gumbel. The randomness is a
    * seed-stable hash uniform u_i = (hash60(id) + 0.5)/2^60, so the
    * "sample" is reproducible under any partitioning AND
    * oracle-replayable; keys round to 6dp before ranking
    * (round-then-rank — transcendental keys never land on midpoints)
    * with the id as tiebreak. Returns (id, n_feat, log_w, gkey, sel).
    */
  def selectGumbel(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, numBuckets: Int, k: Int,
                   seed: Long): DataFrame = {
    val w = importanceWeights(raw, target, idCol, textCol, numBuckets)
    val u = (Sampling.hash60(col("id"), seed).cast("double") + lit(0.5)) /
      lit(GumbelDen)
    // pinned for the same two-consumer reason as select()
    val keyed = graft.core.Pins.pin(w.withColumn("gkey",
      round(col("log_w") + -log(-log(u)), 6)))
    val top = keyed.orderBy(col("gkey").desc, col("id")).limit(k)
      .select(col("id"))
    keyed.join(top.withColumn("sel", lit(1)), Seq("id"), "left")
      .select(col("id"), col("n_feat"), col("log_w"), col("gkey"),
        coalesce(col("sel"), lit(0)).as("sel"))
  }
}
