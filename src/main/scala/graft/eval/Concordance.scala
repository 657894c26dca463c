package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Concordance indices (reference: src/elastic_surv/models/base.py:80
  * `concordance_td()`, Antolini et al. 2005).
  *
  * Comparable pair: (i, j) with t_i < t_j and e_i = 1. Ties in the
  * prediction score 0.5.
  *
  *  - [[harrell]] compares a scalar risk (higher risk ⇒ earlier
  *    event expected): concordant iff risk_i > risk_j.
  *  - [[antolini]] compares time-dependent survival at t_i:
  *    concordant iff S(t_i|x_i) < S(t_i|x_j), with S provided in long
  *    form (id, tau, s) on a discrete grid — evaluated as a step
  *    function (last grid point <= t_i).
  *
  * Scale shape: the pair space is quadratic; at parity scale (the 10%
  * test tail) the inner side is broadcast into a nested-loop range
  * join. The 100-TB path is the O(n log n) sort-based counting
  * aggregator (planned SURVEY §7.5) — the API here is the stable
  * surface for it.
  */
object Concordance {

  /** One-row result: comparable (long), concordant (double, ties=0.5),
    * cindex (double).
    */
  def harrell(df: DataFrame, tCol: String, eCol: String,
              riskCol: String): DataFrame = {
    // contract (shared with ScalableConcordance.harrell, which must
    // produce the identical counts): rows with null t/e/risk carry no
    // pair semantics and are excluded up front
    val clean = df.filter(col(tCol).isNotNull && col(eCol).isNotNull &&
      col(riskCol).isNotNull)
    val i = clean.select(col(tCol).cast("double").as("ti"),
      col(eCol).cast("int").as("ei"), col(riskCol).cast("double").as("ri"))
    val j = clean.select(col(tCol).cast("double").as("tj"),
      col(riskCol).cast("double").as("rj"))
    pairCindex(
      i.filter(col("ei") === 1).join(broadcast(j), col("ti") < col("tj")),
      col("ri") > col("rj"), col("ri") === col("rj"))
  }

  /** Antolini time-dependent C-index. `surv` is long-form
    * (idCol, tau, s) per subject over `grid`; S(t_i|x) is the step
    * value at the last tau <= t_i.
    *
    * The step lookup resolves each event time to its grid point with
    * a literal-array expression, so the surv join is an EQUI-join on
    * tau (hash join) — not a nested-loop range join; events with
    * t_i below the grid are excluded (no step value), matching the
    * range-join semantics.
    */
  /** Step lookup τ(t): the LAST grid point <= t, null below the grid
    * — the single definition of "which events are scoreable", shared
    * with [[ScalableConcordance.antolini]] (their agreement is a
    * correctness invariant: q_cindex_td must equal q_cindex_td_sorted).
    */
  def tauStep(grid: Array[Double], t: Column): Column = {
    val eligible = filter(array(grid.map(lit(_)): _*), g => g <= t)
    when(size(eligible) > 0, element_at(eligible, -1))
  }

  def antolini(df: DataFrame, idCol: String, tCol: String, eCol: String,
               surv: DataFrame, grid: Array[Double]): DataFrame = {
    val base = df.select(col(idCol).as("i"), col(tCol).cast("double").as("ti"),
      col(eCol).cast("int").as("ei"))
    val tauStep = Concordance.tauStep(grid, col("ti"))
    val sAt = base.filter(col("ei") === 1)
      .withColumn("tau_i", tauStep)
      .filter(col("tau_i").isNotNull)
      .join(surv.select(col(idCol).as("k"), col("tau"), col("s")),
        col("tau") === col("tau_i"))
      .select(col("i"), col("ti"), col("k"), col("s").as("s_at_ti"))
    // self: k = i; other: k = j with t_j > t_i
    val self = sAt.filter(col("k") === col("i"))
      .select(col("i"), col("ti"), col("s_at_ti").as("si"))
    val others = sAt.select(col("i"), col("k").as("j"), col("s_at_ti").as("sj"))
    val tj = df.select(col(idCol).as("j"), col(tCol).cast("double").as("tj"))
    val pairs = self
      .join(others, Seq("i"))
      .join(tj, Seq("j"))
      .filter(col("ti") < col("tj"))
    pairCindex(pairs, col("si") < col("sj"), col("si") === col("sj"))
  }

  private def pairCindex(pairs: DataFrame, conc: Column, tie: Column): DataFrame =
    pairs.agg(
        count(lit(1)).as("comparable"),
        sum(when(conc, 1.0).when(tie, 0.5).otherwise(0.0)).as("concordant"))
      .select(col("comparable"), col("concordant"),
        (col("concordant") / col("comparable")).as("cindex"))
}
