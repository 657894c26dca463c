package graft.queries

import graft.core.Attach.AttachOps
import graft.model.CoxPH
import graft.surv.{ChurnView, DurationCuts}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model operators as deterministic fixed-weight forward passes
  * (SURVEY §5 tier 2: iterative fits aren't bit-stable across
  * engines; the algebra they execute is). Fixed linear predictor over
  * churn features:
  *
  *   lp = c_acctbal·(−1e−4) + n_orders·0.01 + total_spent·1e−7
  *
  * covering M1 (risk score), M2 (Breslow baseline on the full train
  * split), M3 (survival matrix) through the SAME code paths the
  * trained model uses (CoxPH.breslow / CoxPH.baselineAtGrid).
  */
object ModelQueries {

  private val C = ChurnView.sql
  private val splitSql =
    """tl AS (SELECT CAST(floor(count(*) * CAST(0.9 AS DOUBLE)) AS BIGINT)
      |          AS train_len FROM churn)""".stripMargin

  private def lpCol: Column =
    col("c_acctbal").cast("double") * lit(-0.0001) +
      col("n_orders").cast("double") * lit(0.01) +
      col("total_spent").cast("double") * lit(1.0e-7)

  private val lpSql =
    """CAST(c_acctbal AS DOUBLE) * CAST(-0.0001 AS DOUBLE)
      |         + CAST(n_orders AS DOUBLE) * CAST(0.01 AS DOUBLE)
      |         + CAST(total_spent AS DOUBLE) * CAST(0.0000001 AS DOUBLE)""".stripMargin

  private def trainWithLp(s: SparkSession, dir: String): DataFrame = {
    val ds = ChurnView.dataset(s, dir)
    ds.train.select(col("id"), col("t").cast("double").as("t"), col("e"),
      lpCol.as("lp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1: risk scores e^{g(x)} with fixed weights.
    "q_cox_risk" -> ((s, dir) =>
      ChurnView.build(s, dir)
        .select(col("id"), round(exp(lpCol), 6).as("risk"))
        .orderBy("id")),

    // M2: Breslow cumulative baseline hazard on the full train split.
    "q_cox_breslow" -> ((s, dir) =>
      CoxPH.breslow(trainWithLp(s, dir), col("lp"))
        .select(col("t"), round(col("H0"), 6).as("h0cum"))
        .orderBy("t")),

    // M3: survival matrix S(τ|x) = exp(−H₀(τ)·e^{lp}) for the test
    // split over a 10-point train-fitted grid (long form). The
    // baseline stays a DataFrame: step values per grid point come from
    // a broadcast range join (CoxPH.baselineAtGrid), then the
    // |grid|-row result broadcasts to the test scan — no driver
    // collect, no literal expression tree.
    "q_cox_surv" -> ((s, dir) => {
      val h0g = gridH0(s, dir)
      val ds = ChurnView.dataset(s, dir)
      ds.test.select(col("id"), lpCol.as("lp"))
        .attach(h0g)
        .select(col("id"), col("tau_idx"), col("tau"),
          round(exp(-col("h0") * exp(col("lp"))), 6).as("s"))
        .orderBy("id", "tau_idx")
    }),

    // A5: mean survival curve across subjects (np.mean(pred, axis=1),
    // tutorial_2 cell 12) — same broadcast step join + groupBy(tau).
    "q_avg_surv_curve" -> ((s, dir) => {
      val h0g = gridH0(s, dir)
      val ds = ChurnView.dataset(s, dir)
      ds.test.select(col("id"), lpCol.as("lp"))
        .attach(h0g)
        .select(col("tau_idx"), col("tau"),
          exp(-col("h0") * exp(col("lp"))).as("s"))
        .groupBy(col("tau_idx"), col("tau"))
        .agg(round(avg(col("s")), 6).as("avg_s"))
        .orderBy("tau_idx")
    }))

  /** H0 step values on the 10-point train-fitted grid: Breslow
    * baseline (distributed) ⋈ broadcast grid.
    */
  private def gridH0(s: SparkSession, dir: String): DataFrame = {
    val ds = ChurnView.dataset(s, dir)
    val baseline = CoxPH.breslow(trainWithLp(s, dir), col("lp"))
    val grid = DurationCuts.fit(ds.train, "t", 10)
    import s.implicits._
    val g = grid.cuts.zipWithIndex.map(p => (p._2, p._1)).toSeq
      .toDF("tau_idx", "tau")
    CoxPH.baselineAtGrid(baseline, g)
  }

  private val trainSql =
    s"""trn AS (
       |  SELECT id, CAST(t AS DOUBLE) AS t, e,
       |         $lpSql AS lp
       |  FROM churn_rn CROSS JOIN tl WHERE rn < train_len)""".stripMargin

  // w_t mirrors the engine: ±50-clamped exp summed in DECIMAL(38,15)
  // (order-independent both engines) with the VARCHAR-route conversion
  // (DuckDB's direct decimal→double double-rounds past ~2^53 scaled
  // units; these sums cross that)
  private val breslowSql =
    """bt0 AS (SELECT t,
      |               CAST(CAST(sum(CAST(exp(least(CAST(50 AS DOUBLE),
      |                                            greatest(CAST(-50 AS DOUBLE),
      |                                                     lp)))
      |                                  AS DECIMAL(38,15)))
      |                    AS VARCHAR) AS DOUBLE) AS w_t,
      |               CAST(sum(e) AS BIGINT) AS d
      |        FROM trn GROUP BY t),
      |bt1 AS (SELECT t, d, sum(w_t) OVER (ORDER BY t DESC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s0
      |        FROM bt0),
      |bres AS (SELECT t, sum(CAST(d AS DOUBLE) / s0) OVER (ORDER BY t
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h0cum
      |         FROM bt1 WHERE d > 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_cox_risk" -> (C +
      s"""SELECT id, round(exp($lpSql), 6) AS risk
         |FROM churn ORDER BY id""".stripMargin),

    "q_cox_breslow" -> (C + s", $splitSql,\n$trainSql,\n$breslowSql\n" +
      "SELECT t, round(h0cum, 6) AS h0cum FROM bres ORDER BY t"),

    "q_cox_surv" -> (C + s", $splitSql,\n$trainSql,\n$breslowSql,\n" +
      s"""rng AS (SELECT min(t) AS tmin, max(t) AS tmax,
         |               (max(t) - min(t)) / CAST(9 AS DOUBLE) AS step FROM trn),
         |grid AS (SELECT CAST(range AS INT) AS tau_idx,
         |                CASE WHEN range = 9 THEN tmax
         |                     ELSE tmin + range * step END AS tau
         |         FROM range(10) CROSS JOIN rng),
         |tst AS (SELECT id, $lpSql AS lp
         |        FROM churn_rn CROSS JOIN tl WHERE rn >= train_len),
         |h0g AS (SELECT tau_idx, tau, coalesce(max_by(bres.h0cum, bres.t),
         |               CAST(0 AS DOUBLE)) AS h0
         |        FROM grid LEFT JOIN bres ON bres.t <= grid.tau
         |        GROUP BY tau_idx, tau)
         |SELECT id, tau_idx, tau, round(exp(-h0 * exp(lp)), 6) AS s
         |FROM tst CROSS JOIN h0g ORDER BY id, tau_idx""".stripMargin),

    "q_avg_surv_curve" -> (C + s", $splitSql,\n$trainSql,\n$breslowSql,\n" +
      s"""rng AS (SELECT min(t) AS tmin, max(t) AS tmax,
         |               (max(t) - min(t)) / CAST(9 AS DOUBLE) AS step FROM trn),
         |grid AS (SELECT CAST(range AS INT) AS tau_idx,
         |                CASE WHEN range = 9 THEN tmax
         |                     ELSE tmin + range * step END AS tau
         |         FROM range(10) CROSS JOIN rng),
         |tst AS (SELECT id, $lpSql AS lp
         |        FROM churn_rn CROSS JOIN tl WHERE rn >= train_len),
         |h0g AS (SELECT tau_idx, tau, coalesce(max_by(bres.h0cum, bres.t),
         |               CAST(0 AS DOUBLE)) AS h0
         |        FROM grid LEFT JOIN bres ON bres.t <= grid.tau
         |        GROUP BY tau_idx, tau)
         |SELECT tau_idx, tau, round(avg(exp(-h0 * exp(lp))), 6) AS avg_s
         |FROM tst CROSS JOIN h0g GROUP BY tau_idx, tau
         |ORDER BY tau_idx""".stripMargin))
}
