package graft.queries

import graft.automl.Hyperband
import graft.model.{CoxMlp, DeepHit, FittedCoxMlp, FittedDeepHit, FittedLogisticHazard, FittedLogisticHazardMlp, LogisticHazard, LogisticHazardMlp}
import graft.surv.{ChurnView, DurationCuts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Discrete-time model operators (M4-M6), the DeepHit pair-rank
  * matrix (E6), and the Hyperband schedule (H3) as oracle-checked
  * queries — fixed-weight forward passes through the REAL fitted-model
  * code paths (hazards/discreteSurv/pmf/Interpolation/pairRankDF)
  * with hand-picked exact-double weights; only exp()/sigmoid ulps get
  * rounded away.
  */
object DiscreteQueries {

  private val C = ChurnView.sql
  private val splitSql =
    """tl AS (SELECT CAST(floor(count(*) * CAST(0.9 AS DOUBLE)) AS BIGINT)
      |          AS train_len FROM churn)""".stripMargin
  // engine tensorization narrows features to float32 (E5,
  // dataset.py:223); the oracle mirrors it with CAST(... AS REAL).
  private val lpSql =
    """CAST(CAST(c_acctbal AS REAL) AS DOUBLE) * CAST(-0.0001 AS DOUBLE)
      |       + CAST(CAST(n_orders AS REAL) AS DOUBLE) * CAST(0.01 AS DOUBLE)
      |       + CAST(CAST(total_spent AS REAL) AS DOUBLE) * CAST(0.0000001 AS DOUBLE)""".stripMargin

  private val K = 5

  /** β over the 33-wide encoded feature vector: nonzero only at
    * c_acctbal / n_orders / total_spent, same constants as lpSql.
    */
  private def betaBase(feats: Seq[String]): Array[Double] = {
    val beta = Array.fill(feats.size)(0.0)
    beta(feats.indexOf("c_acctbal")) = -0.0001
    beta(feats.indexOf("n_orders")) = 0.01
    beta(feats.indexOf("total_spent")) = 1.0e-7
    beta
  }

  private def fixedB: Array[Double] = Array.tabulate(K)(k => -2.0 + 0.25 * k)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M4 input shape: person-period expansion with K=5 train cuts.
    "q_pp_expand" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      ds.train
        .select(col("id"), cuts.indexCol(col("t")).as("t_idx"), col("e"))
        .select(col("id"), col("t_idx"), col("e"),
          explode(sequence(lit(0), col("t_idx"))).as("j"))
        .select(col("id"), col("j"),
          when(col("j") === col("t_idx") && col("e") === 1, 1)
            .otherwise(0).as("y"))
        .orderBy("id", "j")
    }),

    // M4 forward: discrete hazards + survival with fixed weights.
    "q_loghaz_forward" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val fitted = FittedLogisticHazard(LogisticHazard(K), cuts,
        fixedB, betaBase(ds.encodedFeatures))
      val xd = transform(col("x"), _.cast("double"))
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .withColumn("hz", fitted.hazards(xd))
        .select(col("id"),
          posexplode(arrays_zip(col("hz").as("h"),
            fitted.survFromHazards(col("hz")).as("sv"))))
        .select(col("id"), col("pos").as("k"),
          round(col("col.h"), 6).as("h"), round(col("col.sv"), 6).as("s"))
        .orderBy("id", "k")
    }),

    // M6: linear interpolation of the discrete curve onto a 20-point
    // test-range grid, through Interpolation.linearAt.
    "q_interpolate" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val fitted = FittedLogisticHazard(LogisticHazard(K), cuts,
        fixedB, betaBase(ds.encodedFeatures))
      val tst = ds.tensorized(ds.test).withColumnRenamed("rn", "id")
      val r = tst.agg(min(col("t")), max(col("t"))).head()
      val grid = DurationCuts.linspace(r.getDouble(0), r.getDouble(1), 20)
      fitted.predictSurv(tst, grid)
        .select(col("id"), col("tau_idx"), col("tau"), round(col("s"), 6).as("s"))
        .orderBy("id", "tau_idx")
    }),

    // M6 pycox flavor: const-pdf `interpolate(sub=4)` subdivided grid
    // of the same fixed-weight discrete curve (InterpolateDiscrete).
    "q_interpolate_cdi" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val fitted = FittedLogisticHazard(LogisticHazard(K), cuts,
        fixedB, betaBase(ds.encodedFeatures))
      val xd = transform(col("x"), _.cast("double"))
      val sub = 4
      val times = graft.model.Interpolation.constPdfTimes(cuts.cuts, sub)
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .select(col("id"), posexplode(arrays_zip(
          array(times.map(lit(_)): _*).as("tau"),
          graft.model.Interpolation.constPdf(fitted.discreteSurv(xd), K, sub)
            .as("sv"))))
        .select(col("id"), col("pos").as("m"), col("col.tau").as("tau"),
          round(col("col.sv"), 6).as("s"))
        .orderBy("id", "m")
    }),

    // M5 forward: softmax PMF + survival with fixed per-bin weights.
    "q_deephit_forward" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val base = betaBase(ds.encodedFeatures)
      val cArr = Array.tabulate(K)(k => 0.1 * k - 0.2)
      val wMat = Array.tabulate(K) { k =>
        val frac = (k + 1) / 5.0
        base.map(_ * frac)
      }
      val fitted = FittedDeepHit(DeepHit(K), cuts, cArr, wMat)
      val xd = transform(col("x"), _.cast("double"))
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .withColumn("pm", fitted.pmf(xd))
        .select(col("id"),
          posexplode(arrays_zip(col("pm").as("p"),
            fitted.survFromPmf(col("pm")).as("sv"))))
        .select(col("id"), col("pos").as("k"),
          (round(col("col.p"), 6) + lit(0.0)).as("pmf"),
          (round(col("col.sv"), 6) + lit(0.0)).as("s"))
        .orderBy("id", "k")
    }),

    // M9 forward: fixed-weight 2-unit ReLU MLP head through the REAL
    // FittedDeepHit column path (featCol → pmf → discreteSurv).
    "q_deephit_mlp_forward" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val base = betaBase(ds.encodedFeatures)
      val cArr = Array.tabulate(K)(k => 0.1 * k - 0.2)
      val wMat = Array.tabulate(K)(k =>
        Array(0.3 * ((k + 1) / 5.0), -0.2 * ((k + 1) / 5.0)))
      val fitted = FittedDeepHit(DeepHit(K, hidden = Seq(2)), cuts, cArr, wMat,
        Seq((Array(base, base.map(-_)), Array(0.01, 0.02))))
      val xd = transform(col("x"), _.cast("double"))
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .withColumn("pm", fitted.pmf(xd))
        .select(col("id"),
          posexplode(arrays_zip(col("pm").as("p"),
            fitted.survFromPmf(col("pm")).as("sv"))))
        .select(col("id"), col("pos").as("k"),
          (round(col("col.p"), 6) + lit(0.0)).as("pmf"),
          (round(col("col.sv"), 6) + lit(0.0)).as("s"))
        .orderBy("id", "k")
    }),

    // M9 forward, reference-shaped DEPTH: fixed-weight [2,2] ReLU
    // stack (the MLPVanilla two-layer shape at oracle-checkable
    // width) through the same FittedDeepHit column path.
    "q_deephit_mlp2_forward" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val base = betaBase(ds.encodedFeatures)
      val cArr = Array.tabulate(K)(k => 0.1 * k - 0.2)
      val wMat = Array.tabulate(K)(k =>
        Array(0.3 * ((k + 1) / 5.0), -0.2 * ((k + 1) / 5.0)))
      val l1 = (Array(base, base.map(-_)), Array(0.01, 0.02))
      val l2 = (Array(Array(0.8, -0.6), Array(0.4, 0.9)),
        Array(0.05, -0.03))
      val fitted = FittedDeepHit(DeepHit(K, hidden = Seq(2, 2)), cuts,
        cArr, wMat, Seq(l1, l2))
      val xd = transform(col("x"), _.cast("double"))
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .withColumn("pm", fitted.pmf(xd))
        .select(col("id"),
          posexplode(arrays_zip(col("pm").as("p"),
            fitted.survFromPmf(col("pm")).as("sv"))))
        .select(col("id"), col("pos").as("k"),
          (round(col("col.p"), 6) + lit(0.0)).as("pmf"),
          (round(col("col.sv"), 6) + lit(0.0)).as("s"))
        .orderBy("id", "k")
    }),

    // Neural logistic hazard: fixed-weight ReLU pair + per-bin
    // sigmoid read-outs through the REAL FittedLogisticHazardMlp
    // column path (hazards → running-product survival).
    "q_loghaz_mlp_forward" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val base = betaBase(ds.encodedFeatures)
      val wMat = Array.tabulate(K)(k =>
        Array(0.3 * ((k + 1) / 5.0), -0.2 * ((k + 1) / 5.0)))
      val fitted = FittedLogisticHazardMlp(
        LogisticHazardMlp(K, hidden = Seq(2)), cuts, fixedB, wMat,
        Seq((Array(base, base.map(-_)), Array(0.01, 0.02))))
      val xd = transform(col("x"), _.cast("double"))
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .withColumn("hz", fitted.hazards(xd))
        .select(col("id"),
          posexplode(arrays_zip(col("hz").as("h"),
            fitted.survFromHazards(col("hz")).as("sv"))))
        .select(col("id"), col("pos").as("k"),
          round(col("col.h"), 6).as("h"), round(col("col.sv"), 6).as("s"))
        .orderBy("id", "k")
    }),

    // Neural-Cox (DeepSurv) risk head: fixed-weight ReLU pair +
    // no-output-bias linear read-out through the REAL
    // FittedCoxMlp.riskScore column path (identity scaler).
    "q_cox_mlp_risk" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val base = betaBase(ds.encodedFeatures)
      val l1 = (Array(base, base.map(-_)), Array(0.01, 0.02))
      val fitted = FittedCoxMlp(CoxMlp(hidden = Seq(2)), Array(0.8, -0.6),
        Seq(l1), Array.fill(base.length)(0.0), Array.fill(base.length)(1.0),
        null)
      val xd = transform(col("x"), _.cast("double"))
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .select(col("id"), round(exp(fitted.riskScore(xd)), 6).as("risk"))
        .orderBy("id")
    }),

    // Batch-norm EVAL chain through the REAL fold: Spark builds a
    // bn θ (γ, β) plus fixed population stats (μ, σ²), folds them
    // into plain layers via MlpStack.extract(θ, stats), and scores
    // through FittedCoxMlp's column path; the oracle computes the
    // UNfolded eval definition γ·(z−μ)/√(σ²+ε)+β in SQL — hash
    // equality proves the fold arithmetic, not just the spec's 1e-12.
    "q_cox_mlp_bn_risk" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val base = betaBase(ds.encodedFeatures)
      val p = base.length
      val stack = new graft.model.MlpStack(p, Seq(2), 2,
        bn = true, bnBatch = true)
      val theta = new Array[Double](2 + stack.size)
      theta(0) = 0.8; theta(1) = -0.6
      base.indices.foreach { m =>
        theta(stack.offA(0) + m) = base(m)
        theta(stack.offA(0) + p + m) = -base(m)
      }
      theta(stack.offB(0)) = 0.01; theta(stack.offB(0) + 1) = 0.02
      theta(stack.offG(0)) = 1.25; theta(stack.offG(0) + 1) = 0.8
      theta(stack.offBt(0)) = 0.05; theta(stack.offBt(0) + 1) = -0.1
      val stats = Array((Array(0.3, -0.2), Array(0.7, 1.3)))
      val layers = stack.extract(theta, Some(stats))
      val fitted = FittedCoxMlp(CoxMlp(hidden = Seq(2), batchNorm = true),
        Array(0.8, -0.6), layers,
        Array.fill(p)(0.0), Array.fill(p)(1.0), null)
      val xd = transform(col("x"), _.cast("double"))
      ds.tensorized(ds.test).withColumnRenamed("rn", "id")
        .select(col("id"), round(exp(fitted.riskScore(xd)), 6).as("risk"))
        .orderBy("id")
    }),

    // E6: pair-rank matrix of the first train batch [0, 128).
    "q_pair_rank" -> ((s, dir) => {
      val ds = ChurnView.dataset(s, dir)
      val cuts = DurationCuts.fit(ds.train, "t", K)
      val batch = ds.batch(ds.train, 0, 128)
        .select(col("id"), cuts.indexCol(col("t")).as("k"), col("e"))
      DeepHit.pairRankDF(batch, "id", "k", "e").orderBy("i", "j")
    }),

    // H3: the Hyperband bracket/rung schedule (default 81/3).
    "q_hyperband_schedule" -> ((s, dir) => {
      import s.implicits._
      Hyperband.scheduleExact(81, 3).toDF("s", "i", "n_configs", "epochs")
        .orderBy(col("s").desc, col("i"))
    }))

  private val trnSql =
    s"""trn AS (SELECT id, CAST(t AS DOUBLE) AS t, e
       |        FROM churn_rn CROSS JOIN tl WHERE rn < train_len),
       |rng4 AS (SELECT CAST(min(t) AS DOUBLE) AS tmin, CAST(max(t) AS DOUBLE) AS tmax,
       |                (max(t) - min(t)) / CAST(4 AS DOUBLE) AS step FROM trn)""".stripMargin

  // id below is the STABLE ROW NUMBER, not the custkey: the engine's
  // tensorized(test) carries rn, and the two diverge as soon as one
  // customer has no orders (sf0.1 has exactly one such custkey —
  // matching on raw id silently passed at sf0.01 where none do).
  private val tstSql =
    s"""tst AS (SELECT rn AS id, CAST(t AS DOUBLE) AS t, e, $lpSql AS lp
       |        FROM churn_rn CROSS JOIN tl WHERE rn >= train_len)""".stripMargin

  private val hazSql =
    """hz AS (SELECT id, CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(CAST(-2 AS DOUBLE) + CAST(0.25 AS DOUBLE) * 0 + lp))) AS h0, CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(CAST(-2 AS DOUBLE) + CAST(0.25 AS DOUBLE) * 1 + lp))) AS h1, CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(CAST(-2 AS DOUBLE) + CAST(0.25 AS DOUBLE) * 2 + lp))) AS h2, CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(CAST(-2 AS DOUBLE) + CAST(0.25 AS DOUBLE) * 3 + lp))) AS h3, CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(CAST(-2 AS DOUBLE) + CAST(0.25 AS DOUBLE) * 4 + lp))) AS h4 FROM tst),
      |hzs AS (SELECT hz.*, ((CAST(1 AS DOUBLE) - h0)) AS s0, ((CAST(1 AS DOUBLE) - h0) * (CAST(1 AS DOUBLE) - h1)) AS s1, ((CAST(1 AS DOUBLE) - h0) * (CAST(1 AS DOUBLE) - h1) * (CAST(1 AS DOUBLE) - h2)) AS s2, ((CAST(1 AS DOUBLE) - h0) * (CAST(1 AS DOUBLE) - h1) * (CAST(1 AS DOUBLE) - h2) * (CAST(1 AS DOUBLE) - h3)) AS s3, ((CAST(1 AS DOUBLE) - h0) * (CAST(1 AS DOUBLE) - h1) * (CAST(1 AS DOUBLE) - h2) * (CAST(1 AS DOUBLE) - h3) * (CAST(1 AS DOUBLE) - h4)) AS s4 FROM hz),
      |sv AS (SELECT id, CAST(k AS INT) AS k, h, s
      |       FROM (SELECT id,
      |                    unnest([0, 1, 2, 3, 4]) AS k,
      |                    unnest([h0, h1, h2, h3, h4]) AS h,
      |                    unnest([s0, s1, s2, s3, s4]) AS s
      |             FROM hzs))""".stripMargin

  /** DeepHit per-k fixed-weight expressions, generated to mirror the
    * Scala constants exactly.
    */
  /** The max-shift softmax + cumulative-survival expression strings
    * (mx/es/tot/ps/ss) shared by the three discrete-head oracle
    * builders — one definition of the numerically-stable pipeline so
    * the exp-shift/cumsum shape cannot drift between flavors.
    */
  private def softmaxChain(): (String, String, String, String, String) = {
    val mx = s"greatest(${(0 until K).map(k => s"z$k").mkString(", ")})"
    val es = (0 until K).map(k => s"exp(z$k - mx) AS e$k").mkString(", ")
    val tot = (0 until K).map(k => s"e$k").mkString(" + ")
    val ps = (0 until K).map(k => s"e$k / tot AS p$k").mkString(", ")
    val ss = (0 until K).map { k =>
      val cum = (0 to k).map(j => s"p$j").mkString(" + ")
      s"CAST(1 AS DOUBLE) - ($cum) AS s$k"
    }.mkString(", ")
    (mx, es, tot, ps, ss)
  }

  private val deephitSelect: String = {
    def zk(k: Int) =
      s"""(CAST(0.1 AS DOUBLE) * $k - CAST(0.2 AS DOUBLE)
         | + (CAST(CAST(c_acctbal AS REAL) AS DOUBLE) * (CAST(-0.0001 AS DOUBLE) * frac$k)
         |    + CAST(CAST(n_orders AS REAL) AS DOUBLE) * (CAST(0.01 AS DOUBLE) * frac$k)
         |    + CAST(CAST(total_spent AS REAL) AS DOUBLE) * (CAST(0.0000001 AS DOUBLE) * frac$k)))"""
        .stripMargin.replaceAll("\n", " ")
    val fracs = (0 until K).map(k =>
      s"CAST(${k + 1} AS DOUBLE) / CAST(5 AS DOUBLE) AS frac$k").mkString(", ")
    val zs = (0 until K).map(k => s"${zk(k)} AS z$k").mkString(", ")
    val (mx, es, tot, ps, ss) = softmaxChain()
    s"""dh0 AS (SELECT rn, id, $fracs FROM churn_rn CROSS JOIN tl WHERE rn >= train_len),
       |dh0b AS (SELECT dh0.rn AS id, $zs
       |         FROM dh0 JOIN churn ON dh0.id = churn.id),
       |dh1 AS (SELECT id, $mx AS mx FROM dh0b),
       |dh2 AS (SELECT dh0b.id, $es FROM dh0b JOIN dh1 ON dh0b.id = dh1.id),
       |dh3 AS (SELECT dh2.*, $tot AS tot FROM dh2),
       |dh4 AS (SELECT id, $ps FROM dh3),
       |dh5 AS (SELECT dh4.*, $ss FROM dh4)""".stripMargin
  }

  /** MLP-head fixed-weight expressions: ReLU hidden pair over ±lp,
    * then the same softmax/cumsum pipeline as [[deephitSelect]]. The
    * weight literals are COMPUTED here with the exact Scala arithmetic
    * the query uses, then interpolated (Double.toString round-trips).
    */
  private val mlpSelect: String = {
    val w0 = (0 until K).map(k => 0.3 * ((k + 1) / 5.0))
    val w1 = (0 until K).map(k => -0.2 * ((k + 1) / 5.0))
    val cs = (0 until K).map(k => 0.1 * k - 0.2)
    val zs = (0 until K).map(k =>
      s"(CAST(${cs(k)} AS DOUBLE) + (CAST(${w0(k)} AS DOUBLE) * h0" +
        s" + CAST(${w1(k)} AS DOUBLE) * h1)) AS z$k").mkString(", ")
    val (mx, es, tot, ps, ss) = softmaxChain()
    val lp = lpSql.replaceAll("\n", " ")
    s"""mh AS (SELECT rn AS id,
       |             greatest(CAST(0 AS DOUBLE), CAST(0.01 AS DOUBLE) + ($lp)) AS h0,
       |             greatest(CAST(0 AS DOUBLE), CAST(0.02 AS DOUBLE) - ($lp)) AS h1
       |       FROM churn_rn CROSS JOIN tl WHERE rn >= train_len),
       |mz AS (SELECT id, $zs FROM mh),
       |mz1 AS (SELECT id, $mx AS mx FROM mz),
       |mz2 AS (SELECT mz.id, $es FROM mz JOIN mz1 ON mz.id = mz1.id),
       |mz3 AS (SELECT mz2.*, $tot AS tot FROM mz2),
       |mz4 AS (SELECT id, $ps FROM mz3),
       |mz5 AS (SELECT mz4.*, $ss FROM mz4)""".stripMargin
  }

  /** Two-layer flavor: a second fixed-weight ReLU pair g = relu(B·h
    * + d) over [[mlpSelect]]'s hidden pair, then the same
    * softmax/cumsum pipeline (CTEs ng…ng5). Reuses mh from
    * mlpSelect — compose as `$mlpSelect,\n$mlp2Select`.
    */
  private val mlp2Select: String = {
    val w0 = (0 until K).map(k => 0.3 * ((k + 1) / 5.0))
    val w1 = (0 until K).map(k => -0.2 * ((k + 1) / 5.0))
    val cs = (0 until K).map(k => 0.1 * k - 0.2)
    val zs = (0 until K).map(k =>
      s"(CAST(${cs(k)} AS DOUBLE) + (CAST(${w0(k)} AS DOUBLE) * g0" +
        s" + CAST(${w1(k)} AS DOUBLE) * g1)) AS z$k").mkString(", ")
    val (mx, es, tot, ps, ss) = softmaxChain()
    s"""mg AS (SELECT id,
       |  greatest(CAST(0 AS DOUBLE), CAST(0.05 AS DOUBLE)
       |    + (CAST(0.8 AS DOUBLE) * h0 + CAST(-0.6 AS DOUBLE) * h1)) AS g0,
       |  greatest(CAST(0 AS DOUBLE), CAST(-0.03 AS DOUBLE)
       |    + (CAST(0.4 AS DOUBLE) * h0 + CAST(0.9 AS DOUBLE) * h1)) AS g1
       |  FROM mh),
       |ng AS (SELECT id, $zs FROM mg),
       |ng1 AS (SELECT id, $mx AS mx FROM ng),
       |ng2 AS (SELECT ng.id, $es FROM ng JOIN ng1 ON ng.id = ng1.id),
       |ng3 AS (SELECT ng2.*, $tot AS tot FROM ng2),
       |ng4 AS (SELECT id, $ps FROM ng3),
       |ng5 AS (SELECT ng4.*, $ss FROM ng4)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_pp_expand" -> (C + s", $splitSql,\n$trnSql\n" +
      """SELECT id, CAST(j AS INT) AS j,
        |       CASE WHEN j = t_idx AND e = 1 THEN 1 ELSE 0 END AS y
        |FROM (SELECT id, e, t_idx, unnest(generate_series(0, t_idx)) AS j
        |      FROM (SELECT id, e,
        |                   LEAST(GREATEST(CAST(FLOOR((t - tmin) / step) AS INT), 0), 4) AS t_idx
        |            FROM trn CROSS JOIN rng4))
        |ORDER BY id, j""".stripMargin),

    "q_loghaz_forward" -> (C + s", $splitSql,\n$tstSql,\n$hazSql\n" +
      "SELECT id, k, round(h, 6) AS h, round(s, 6) AS s FROM sv ORDER BY id, k"),

    // const-pdf subdivision (sub=4): q = m // 4, r = m % 4,
    //   tau = ct_q + (ct_{q+1} − ct_q)·r/4, s = v_q + (v_{q+1} − v_q)·r/4
    // — exactly the engine's Interpolation.constPdf arithmetic.
    "q_interpolate_cdi" -> (C + s", $splitSql,\n$trnSql,\n$tstSql,\n$hazSql,\n" +
      """cut AS (SELECT CAST(range AS INT) AS k,
        |               CASE WHEN range = 4 THEN tmax ELSE tmin + range * step END AS ct
        |        FROM range(5) CROSS JOIN rng4),
        |pieces AS (SELECT CAST(range AS INT) AS m,
        |                  CAST(range // 4 AS INT) AS q,
        |                  CAST(range % 4 AS INT) AS r
        |           FROM range(17)),
        |j AS (SELECT sv.id, p.m, p.r, sv.s AS v0, sv1.s AS v1,
        |             c0.ct AS t0, c1.ct AS t1
        |      FROM pieces p
        |      JOIN sv ON sv.k = p.q
        |      JOIN cut c0 ON c0.k = p.q
        |      LEFT JOIN cut c1 ON c1.k = p.q + 1
        |      LEFT JOIN sv sv1 ON sv1.id = sv.id AND sv1.k = p.q + 1)
        |SELECT id, m,
        |       CASE WHEN r = 0 THEN t0
        |            ELSE t0 + (t1 - t0) * (CAST(r AS DOUBLE) / CAST(4 AS DOUBLE)) END AS tau,
        |       round(CASE WHEN r = 0 THEN v0
        |                  ELSE v0 + (v1 - v0) * (CAST(r AS DOUBLE) / CAST(4 AS DOUBLE)) END,
        |             6) AS s
        |FROM j ORDER BY id, m""".stripMargin),

    "q_interpolate" -> (C + s", $splitSql,\n$trnSql,\n$tstSql,\n$hazSql,\n" +
      """cut AS (SELECT CAST(range AS INT) AS k,
        |               CASE WHEN range = 4 THEN tmax ELSE tmin + range * step END AS ct
        |        FROM range(5) CROSS JOIN rng4),
        |tr2 AS (SELECT CAST(min(t) AS DOUBLE) AS gmin, CAST(max(t) AS DOUBLE) AS gmax,
        |               (max(t) - min(t)) / CAST(19 AS DOUBLE) AS gstep FROM tst),
        |grid AS (SELECT CAST(range AS INT) AS tau_idx,
        |                CASE WHEN range = 19 THEN gmax ELSE gmin + range * gstep END AS tau
        |         FROM range(20) CROSS JOIN tr2),
        |kn AS (SELECT id, CAST(0 AS DOUBLE) AS kt, CAST(1 AS DOUBLE) AS v FROM tst
        |       UNION ALL
        |       SELECT sv.id, cut.ct AS kt, sv.s AS v FROM sv JOIN cut ON sv.k = cut.k),
        |seg0 AS (SELECT kn.id, g.tau_idx, g.tau,
        |                max_by(kn.v, kn.kt) AS v0, max(kn.kt) AS t0
        |         FROM kn JOIN grid g ON kn.kt <= g.tau
        |         GROUP BY kn.id, g.tau_idx, g.tau),
        |seg1 AS (SELECT kn.id, g.tau_idx, g.tau,
        |                min_by(kn.v, kn.kt) AS v1, min(kn.kt) AS t1
        |         FROM kn JOIN grid g ON kn.kt > g.tau
        |         GROUP BY kn.id, g.tau_idx, g.tau)
        |SELECT s0.id, s0.tau_idx, s0.tau,
        |       round(CASE WHEN s1.t1 IS NULL THEN s0.v0
        |                  ELSE s0.v0 + (s1.v1 - s0.v0) * (s0.tau - s0.t0) / (s1.t1 - s0.t0)
        |             END, 6) AS s
        |FROM seg0 s0 LEFT JOIN seg1 s1
        |  ON s0.id = s1.id AND s0.tau_idx = s1.tau_idx
        |ORDER BY s0.id, s0.tau_idx""".stripMargin),

    "q_deephit_forward" -> (C + s", $splitSql,\n$deephitSelect\n" +
      s"""SELECT id, CAST(k AS INT) AS k,
         |       round(pmf, 6) + CAST(0 AS DOUBLE) AS pmf,
         |       round(s, 6) + CAST(0 AS DOUBLE) AS s
         |FROM (SELECT id,
         |             unnest([${(0 until K).mkString(", ")}]) AS k,
         |             unnest([${(0 until K).map(k => s"p$k").mkString(", ")}]) AS pmf,
         |             unnest([${(0 until K).map(k => s"s$k").mkString(", ")}]) AS s
         |      FROM dh5)
         |ORDER BY id, k""".stripMargin),

    "q_deephit_mlp_forward" -> (C + s", $splitSql,\n$mlpSelect\n" +
      s"""SELECT id, CAST(k AS INT) AS k,
         |       round(pmf, 6) + CAST(0 AS DOUBLE) AS pmf,
         |       round(s, 6) + CAST(0 AS DOUBLE) AS s
         |FROM (SELECT id,
         |             unnest([${(0 until K).mkString(", ")}]) AS k,
         |             unnest([${(0 until K).map(k => s"p$k").mkString(", ")}]) AS pmf,
         |             unnest([${(0 until K).map(k => s"s$k").mkString(", ")}]) AS s
         |      FROM mz5)
         |ORDER BY id, k""".stripMargin),

    "q_loghaz_mlp_forward" -> (C + s", $splitSql,\n$mlpSelect,\n" + {
      val w0 = (0 until K).map(k => 0.3 * ((k + 1) / 5.0))
      val w1 = (0 until K).map(k => -0.2 * ((k + 1) / 5.0))
      val hs = (0 until K).map(k =>
        s"CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-(" +
          s"CAST(-2 AS DOUBLE) + CAST(0.25 AS DOUBLE) * $k" +
          s" + (CAST(${w0(k)} AS DOUBLE) * h0 + CAST(${w1(k)} AS DOUBLE) * h1)" +
          s"))) AS h$k").mkString(", ")
      val ss = (0 until K).map { k =>
        (0 to k).map(j => s"(CAST(1 AS DOUBLE) - h$j)").mkString(" * ")
      }.zipWithIndex.map { case (e, k) => s"($e) AS s$k" }.mkString(", ")
      s"""lmh AS (SELECT id, $hs FROM mh),
         |lms AS (SELECT lmh.*, $ss FROM lmh)
         |SELECT id, CAST(k AS INT) AS k, round(h, 6) AS h, round(s, 6) AS s
         |FROM (SELECT id,
         |             unnest([${(0 until K).mkString(", ")}]) AS k,
         |             unnest([${(0 until K).map(k => s"h$k").mkString(", ")}]) AS h,
         |             unnest([${(0 until K).map(k => s"s$k").mkString(", ")}]) AS s
         |      FROM lms)
         |ORDER BY id, k""".stripMargin
    }),

    "q_cox_mlp_risk" -> (C + s", $splitSql,\n$mlpSelect\n" +
      """SELECT id, round(exp(CAST(0.8 AS DOUBLE) * h0
        |  + CAST(-0.6 AS DOUBLE) * h1), 6) AS risk
        |FROM mh ORDER BY id""".stripMargin),

    // eval-mode BN by DEFINITION (γ·(z−μ)/√(σ²+ε)+β before relu);
    // the engine answers with extract()'s folded layers — ε = 1e-5
    "q_cox_mlp_bn_risk" -> (C + s", $splitSql,\n" + {
      val lp = lpSql.replaceAll("\n", " ")
      s"""bnz AS (SELECT rn AS id,
         |               CAST(0.01 AS DOUBLE) + ($lp) AS z0,
         |               CAST(0.02 AS DOUBLE) - ($lp) AS z1
         |        FROM churn_rn CROSS JOIN tl WHERE rn >= train_len),
         |bnh AS (SELECT id,
         |  greatest(CAST(0 AS DOUBLE),
         |    CAST(1.25 AS DOUBLE) * (z0 - CAST(0.3 AS DOUBLE))
         |      / sqrt(CAST(0.7 AS DOUBLE) + CAST(0.00001 AS DOUBLE))
         |      + CAST(0.05 AS DOUBLE)) AS h0,
         |  greatest(CAST(0 AS DOUBLE),
         |    CAST(0.8 AS DOUBLE) * (z1 - CAST(-0.2 AS DOUBLE))
         |      / sqrt(CAST(1.3 AS DOUBLE) + CAST(0.00001 AS DOUBLE))
         |      + CAST(-0.1 AS DOUBLE)) AS h1
         |  FROM bnz)
         |SELECT id, round(exp(CAST(0.8 AS DOUBLE) * h0
         |  + CAST(-0.6 AS DOUBLE) * h1), 6) AS risk
         |FROM bnh ORDER BY id""".stripMargin
    }),

    "q_deephit_mlp2_forward" -> (C + s", $splitSql,\n$mlpSelect,\n$mlp2Select\n" +
      s"""SELECT id, CAST(k AS INT) AS k,
         |       round(pmf, 6) + CAST(0 AS DOUBLE) AS pmf,
         |       round(s, 6) + CAST(0 AS DOUBLE) AS s
         |FROM (SELECT id,
         |             unnest([${(0 until K).mkString(", ")}]) AS k,
         |             unnest([${(0 until K).map(k => s"p$k").mkString(", ")}]) AS pmf,
         |             unnest([${(0 until K).map(k => s"s$k").mkString(", ")}]) AS s
         |      FROM ng5)
         |ORDER BY id, k""".stripMargin),

    "q_pair_rank" -> (C + s", $splitSql,\n$trnSql,\n" +
      """b AS (SELECT trn.id AS id,
        |             LEAST(GREATEST(CAST(FLOOR((trn.t - tmin) / step) AS INT), 0), 4) AS k,
        |             trn.e AS e
        |      FROM trn CROSS JOIN rng4
        |      JOIN churn_rn ON trn.id = churn_rn.id WHERE churn_rn.rn < 128)
        |SELECT a.id AS i, c.id AS j,
        |       CASE WHEN a.e = 1 AND (a.k < c.k OR (a.k = c.k AND c.e = 0 AND a.id != c.id))
        |            THEN 1 ELSE 0 END AS r
        |FROM b a CROSS JOIN b c ORDER BY i, j""".stripMargin),

    "q_hyperband_schedule" ->
      """WITH br AS (SELECT CAST(4 - range AS INT) AS s FROM range(5)),
        |cfg AS (SELECT s,
        |               CAST((5 * CAST(power(3, s) AS BIGINT) + s) // (s + 1) AS INT) AS n
        |        FROM br),
        |rungs AS (SELECT s, n, CAST(r2.range AS INT) AS i
        |          FROM cfg CROSS JOIN range(5) r2 WHERE r2.range <= s)
        |SELECT s, i,
        |       CAST((n + CAST(power(3, i) AS BIGINT) - 1) // CAST(power(3, i) AS BIGINT) AS INT) AS n_configs,
        |       CAST((81 // CAST(power(3, s) AS BIGINT)) * CAST(power(3, i) AS BIGINT) AS INT) AS epochs
        |FROM rungs ORDER BY s DESC, i""".stripMargin)
}
