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

  /** Mutual information between two categorical columns — the
    * feature-selection / redundancy statistic, per observed value
    * pair: term = (n_ab/N)·ln(n_ab·N/(n_a·n_b)); Σ terms over
    * observed pairs IS the MI (absent pairs contribute 0·ln 0 = 0).
    * Null cells are excluded from every count.
    *
    * Scale: ONE (a, b)-keyed count pass; both marginals re-aggregate
    * the joint table (|A|·|B| rows, not corpus rows) and come back as
    * broadcast joins; exact integer counts, then identical-operand
    * doubles rounded 6dp.
    */
  def mutualInfoPairs(df: DataFrame, a: String, b: String): DataFrame = {
    val joint = df
      .filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a), col(b)).agg(count(lit(1)).as("n_ab"))
    val na = joint.groupBy(col(a)).agg(sum(col("n_ab")).as("n_a"))
    val nb = joint.groupBy(col(b)).agg(sum(col("n_ab")).as("n_b"))
    val tot = joint.agg(sum(col("n_ab")).cast("double").as("n"))
    val term = (col("n_ab").cast("double") / col("n")) *
      log(col("n_ab").cast("double") * col("n") /
        (col("n_a").cast("double") * col("n_b").cast("double")))
    joint.join(broadcast(na), Seq(a))
      .join(broadcast(nb), Seq(b))
      .crossJoin(broadcast(tot))
      .select(col(a), col(b), col("n_ab"), round(term, 6).as("mi_term"))
  }
}
