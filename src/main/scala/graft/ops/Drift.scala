package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitor between two corpus slices: per-token
  * KL(P‖Q) contributions over add-1-smoothed unigram distributions —
  * the check a continuously-ingesting training pipeline runs to catch
  * a source drifting away from its reference mix (cf. the CCNet/DSIR
  * importance-weight machinery in [[Dsir]], which uses the same
  * hashed-unigram ratios for SELECTION; this surfaces them for
  * MONITORING).
  *
  * Scale: tokenize in the scan, ONE (token)-keyed map-side-combined
  * groupBy with conditional sums for both slices (never a
  * (slice, token) double shuffle), and a 1-row totals aggregate
  * broadcast back. Counts are exact integers; p, q, and the KL term
  * are identical-operand double arithmetic rounded to 6 dp, so the
  * result is partitioning-independent and engine-exact.
  */
object Drift {

  /** One row per union-vocabulary token: counts in each slice and the
    * token's KL(P‖Q) contribution p·ln(p/q), with
    * p = (cₐ+1)/(nₐ+V), q = (c_b+1)/(n_b+V). Σ kl_term ≥ 0 is the
    * corpus KL divergence (Gibbs); top |kl_term| tokens name the
    * drift.
    */
  def klByToken(docs: DataFrame, sliceCol: String, a: String, b: String,
                textCol: String): DataFrame = {
    val tok = docs.filter(col(sliceCol).isin(a, b))
      .select(col(sliceCol).as("slice"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
    val counts = tok.groupBy(col("tok")).agg(
      sum(when(col("slice") === a, 1L).otherwise(0L)).as("ca"),
      sum(when(col("slice") === b, 1L).otherwise(0L)).as("cb"))
    val tot = counts.agg(
      sum(col("ca")).cast("double").as("na"),
      sum(col("cb")).cast("double").as("nb"),
      count(lit(1)).cast("double").as("v"))
    val p = (col("ca").cast("double") + lit(1.0)) / (col("na") + col("v"))
    val q = (col("cb").cast("double") + lit(1.0)) / (col("nb") + col("v"))
    counts.crossJoin(broadcast(tot))
      .select(col("tok"), col("ca"), col("cb"),
        round(p * log(p / q), 6).as("kl_term"))
  }
}
