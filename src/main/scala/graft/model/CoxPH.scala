package graft.model

import breeze.linalg.{norm, DenseVector}
import breeze.optimize.{DiffFunction, LBFGS}
import graft.surv.SurvDataset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Linear Cox proportional hazards — the engine's re-expression of
  * the reference's CoxPH adaptor (reference: src/elastic_surv/models/
  * model_cox_ph.py:86-110). The reference wraps a pycox neural risk
  * net; the parity target here is the linear risk score g(x) = βᵀx
  * (SURVEY §2.6 M1, §7.4 non-goals) with the same training objective
  * (Cox partial likelihood, Breslow ties), Breslow baseline hazards,
  * and survival prediction S(t|x) = exp(−H₀(t)·e^{g(x)}).
  *
  * Distributed training design (the MLlib-GLM rhythm, SURVEY §3.2):
  * driver-side Breeze L-BFGS; per iteration ONE pass over the cached,
  * standardized train split computes the exact negative partial
  * log-likelihood and gradient:
  *
  *   1. per-row: score = βᵀx, w = e^score         (codegen'd exprs)
  *   2. groupBy(t): d_t, Σ_{events}score, Σw, and per-feature Σx·w,
  *      Σ_{events}x  (posexplode → groupBy(t, idx): the shuffle is
  *      |distinct t| × p rows, map-side combined)
  *   3. risk sets via suffix sums over DISTINCT times only —
  *      S0(t) window over |T| rows, S1(t, idx) window partitioned by
  *      feature → parallel. (These in-loop windows keep the windowed
  *      form — they run per L-BFGS iteration and |T| is bounded for
  *      grouped survival data; for continuous-time data at extreme
  *      scale they would switch to the same three-pass range scan
  *      `breslow` uses.)
  *   4. loglik = Σ_t [Σscore_ev − d_t·ln S0(t)],
  *      grad_k = Σ_t [Σx_ev − d_t·S1/S0]          (collect: p+1 scalars)
  *
  * No driver-side data, no quadratic pair work, shuffles keyed on t
  * and (t, idx) only. Features are internally standardized (fit on
  * train) for L-BFGS conditioning; β is kept in standardized space
  * with the scaler stored in the fitted model.
  */
final case class CoxPH(
    maxIter: Int = 100,
    tol: Double = 1e-7,
    l2: Double = 1e-4) extends SurvModel {

  def name: String = "cox_ph"

  // Mirrors the spirit of model_cox_ph.py:67-84 (lr, batch_norm, ...)
  // restricted to what a linear model has.
  def hyperparameterSpace: Seq[Param] = Seq(
    FloatP("l2", 1e-6, 1e-1),
    IntegerP("max_iter", 50, 200, 50))

  def fit(ds: SurvDataset): FittedCoxPH = {
    val p = ds.numFeatures
    val raw = ds.tensorized(ds.train)
      .select(col("t").cast("double").as("t"), col("e").cast("int").as("e"),
        transform(col("x"), _.cast("double")).as("x"))

    // ---- scaler (one job): per-feature mean / population std ----
    val stats = raw.select(posexplode(col("x")).as(Seq("idx", "xv")))
      .groupBy("idx")
      .agg(avg(col("xv")).as("mu"), stddev_pop(col("xv")).as("sd"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mu = stats.map(_._2)
    val sd = stats.map(s => if (s._3 == 0.0 || s._3.isNaN) 1.0 else s._3)

    val xstd = zip_with(
      zip_with(col("x"), array(mu.map(lit(_)): _*), (v, m) => v - m),
      array(sd.map(lit(_)): _*), (v, s) => v / s)
    val train = raw.select(col("t"), col("e"), xstd.as("x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    train.count() // materialize once

    val objective = new DiffFunction[DenseVector[Double]] {
      def calculate(beta: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val (ll, grad) = logLikAndGrad(train, beta)
        // negated + ridge
        val reg = 0.5 * l2 * (beta dot beta)
        (-ll + reg, -grad + beta * l2)
      }
    }
    val lbfgs = new LBFGS[DenseVector[Double]](maxIter, 7, tol)
    val beta = lbfgs.minimize(objective, DenseVector.zeros[Double](p))

    // ---- Breslow baseline on the FULL train split at final β ----
    // (deviation from the reference's last-batch artifact, SURVEY §4.2.1)
    // Kept DISTRIBUTED (one row per distinct event time): materialized
    // via persist so the train cache can be released, never collected.
    val baseline = CoxPH.breslow(train, CoxPH.scoreCol(col("x"), beta.toArray))
      .persist(StorageLevel.MEMORY_AND_DISK)
    baseline.count()

    train.unpersist()
    FittedCoxPH(this, beta.toArray, mu, sd, baseline)
  }

  /** Exact partial log-likelihood + gradient in one distributed pass. */
  private def logLikAndGrad(train: DataFrame, beta: DenseVector[Double])
      : (Double, DenseVector[Double]) = {
    val p = beta.length
    val sc = CoxPH.scoreCol(col("x"), beta.toArray)
    val scored = train.select(col("t"), col("e"), col("x"),
      sc.as("sc"), exp(sc).as("w"))

    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perT = scored.groupBy(col("t")).agg(
        sum(col("w")).as("w_t"),
        coalesce(sum(when(col("e") === 1, col("sc"))), lit(0.0)).as("esc"),
        sum(col("e")).as("d"))
      .withColumn("s0", sum(col("w_t")).over(wDesc))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val llRow = perT.filter(col("d") > 0)
      .agg(sum(col("esc") - col("d") * log(col("s0"))).as("ll")).head()
    val ll = if (llRow.isNullAt(0)) 0.0 else llRow.getDouble(0)

    val wDescIdx = Window.partitionBy(col("idx")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vec = scored.select(col("t"), col("e"), col("w"),
      posexplode(col("x")).as(Seq("idx", "xv")))
    val gradRows = vec.groupBy(col("t"), col("idx")).agg(
        sum(col("xv") * col("w")).as("wx"),
        coalesce(sum(when(col("e") === 1, col("xv"))), lit(0.0)).as("xsum"))
      .withColumn("s1", sum(col("wx")).over(wDescIdx))
      .join(perT.select(col("t"), col("d"), col("s0")), Seq("t"))
      .filter(col("d") > 0)
      .groupBy(col("idx"))
      .agg(sum(col("xsum") - col("d") * col("s1") / col("s0")).as("g"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))

    perT.unpersist()
    val grad = DenseVector.zeros[Double](p)
    gradRows.foreach { case (i, g) => grad(i) = g }
    (ll, grad)
  }
}

object CoxPH {

  /** βᵀx through the codegen'd VecDot kernel (sequential double
    * accumulation — same value as the aggregate/zip_with form).
    */
  def scoreCol(x: Column, beta: Array[Double]): Column =
    graft.functions.VecDot.vec_dot(x, array(beta.map(lit(_)): _*))

  /** Breslow cumulative baseline hazard from rows with a linear score
    * column: per distinct event time, h0 = d / S0 (S0 = Σ_{T>=t} e^sc)
    * and H0 = running Σ h0.
    *
    * Distributed like [[graft.eval.KaplanMeier.curveExpr]]: ONE shuffle
    * groups to the distinct-time table, range-partitioned descending,
    * then three cheap passes (per-partition partials → driver carries →
    * seeded per-partition scans) replace the two single-partition
    * ordered windows, so the baseline survives continuous-time data
    * where |distinct t| ≈ n. S0 is scanned in descending-t order,
    * H0 ascending (reverse of the stored order) with its own carries.
    * Double-sum carries combine per-partition partials, so the final
    * ulps can differ from the single-sequence windowed form — absorbed
    * by the round(…, 6) every consumer applies (exp() already makes
    * ulp-exactness impossible across engines).
    */
  def breslow(df: DataFrame, sc: Column): DataFrame = {
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val g = df.select(col("t").cast("double").as("t"), col("e"), exp(sc).as("w"))
      .groupBy(col("t"))
      .agg(sum(col("w")).as("w_t"), sum(col("e").cast("long")).as("d"))
      .repartitionByRange(np, col("t").desc)
      .sortWithinPartitions(col("t").desc)
      .select(col("t"), col("w_t"), col("d"))
    // RDD-level persist shared by object across passes: pins one
    // physical range partitioning and is ContextCleaner-released when
    // the returned frame (or the fitted model holding it) is dropped.
    val rows = g.rdd.persist(StorageLevel.MEMORY_AND_DISK)

    // Pass 1: per-partition Σ w_t → descending-order S0 carries.
    val wParts = rows.mapPartitionsWithIndex { (pid, it) =>
      var s = 0.0
      it.foreach(r => s += r.getDouble(1))
      Iterator.single(pid -> s)
    }.collect().sortBy(_._1).map(_._2)
    val s0Carry = wParts.scanLeft(0.0)(_ + _).init // Σ over partitions < p (larger t)

    // Pass 2: per-partition Σ h0 over event rows (ascending order) →
    // ascending-t H0 carries (partition np-1 holds the smallest t).
    val hParts = rows.mapPartitionsWithIndex { (pid, it) =>
      var s0 = s0Carry(pid)
      var hsum = 0.0
      val h0s = scala.collection.mutable.ArrayBuffer.empty[Double]
      it.foreach { r =>
        s0 += r.getDouble(1)
        val d = r.getLong(2)
        if (d > 0) h0s += d.toDouble / s0
      }
      h0s.reverseIterator.foreach(h => hsum += h) // ascending-t order
      Iterator.single(pid -> hsum)
    }.collect().sortBy(_._1).map(_._2)
    val hCarry = new Array[Double](hParts.length)
    var acc = 0.0
    (hParts.length - 1 to 0 by -1).foreach { p => // ascending-t visit order
      hCarry(p) = acc
      acc += hParts(p)
    }

    // Pass 3: emit (t, H0) — S0 rescanned descending, H0 accumulated
    // ascending from the carry.
    val out = rows.mapPartitionsWithIndex { (pid, it) =>
      var s0 = s0Carry(pid)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      it.foreach { r =>
        s0 += r.getDouble(1)
        val d = r.getLong(2)
        if (d > 0) buf += ((r.getDouble(0), d.toDouble / s0))
      }
      var h = hCarry(pid)
      buf.reverseIterator.map { case (tv, h0) =>
        h += h0
        org.apache.spark.sql.Row(tv, h)
      }
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("H0", org.apache.spark.sql.types.DoubleType))))
  }

  /** Step lookup of the baseline on a τ-grid, fully distributed:
    * H0(τ) = H0 at the last event time <= τ (0 before the first).
    * Since H0 is nondecreasing in t, max(H0) over eligible times IS
    * the step value. The result — one row per grid point — is what
    * callers broadcast to the scoring scan.
    *
    * Join direction matters: Spark can only BUILD (broadcast) the
    * inner side of a join, so a left-outer join with the grid on the
    * left would ignore the broadcast hint and build the BASELINE
    * (~|train| rows with continuous event times) instead. The inner
    * join here streams the baseline against the broadcast |grid|-row
    * build side; grid points before the first event time (dropped by
    * the inner join) are restored by the final |grid|×|grid| left
    * join with H0 = 0.
    */
  def baselineAtGrid(baseline: DataFrame, grid: DataFrame): DataFrame = {
    val stepped = baseline
      .join(broadcast(grid), baseline("t") <= grid("tau"))
      .groupBy(col("tau_idx"))
      .agg(max(col("H0")).as("h0"))
    grid.join(broadcast(stepped), Seq("tau_idx"), "left")
      .select(col("tau_idx"), col("tau"),
        coalesce(col("h0"), lit(0.0)).as("h0"))
  }
}

/** Fitted linear CoxPH: β (standardized space), the scaler, and the
  * Breslow baseline as a persisted DataFrame (t, H0) with one row per
  * distinct event time — distributed, never driver-collected.
  */
final case class FittedCoxPH(
    model: CoxPH,
    beta: Array[Double],
    mu: Array[Double],
    sd: Array[Double],
    baseline: DataFrame) extends FittedSurvModel {

  /** Unpin the persisted Breslow baseline (it recomputes if used
    * again). Discarded fits (Hyperband losers) must call this.
    */
  override def release(): Unit = baseline.unpersist()

  /** Linear risk score on the ORIGINAL feature space. */
  def riskScore(x: Column): Column = {
    val xstd = zip_with(
      zip_with(x, array(mu.map(lit(_)): _*), (v, m) => v - m),
      array(sd.map(lit(_)): _*), (v, s) => v / s)
    CoxPH.scoreCol(xstd, beta)
  }

  def predictSurv(tensorized: DataFrame, grid: Array[Double]): DataFrame = {
    val spark = tensorized.sparkSession
    import spark.implicits._
    val g = grid.zipWithIndex.map(p => (p._2, p._1)).toSeq.toDF("tau_idx", "tau")
    val h0g = CoxPH.baselineAtGrid(baseline, g)
    val xd = transform(col("x"), _.cast("double"))
    tensorized.select(col("id"), riskScore(xd).as("sc"))
      .crossJoin(broadcast(h0g))
      .select(col("id"), col("tau_idx"), col("tau"),
        exp(-col("h0") * exp(col("sc"))).as("s"))
  }
}
