package graft.model

import graft.surv.{DurationCuts, SurvDataset}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Discrete-time logistic hazard (reference: src/elastic_surv/models/
  * model_logistic_hazard.py). The reference trains a pycox
  * `LogisticHazard` net with `num_durations` output logits; the linear
  * parity model is the classic discrete-hazard GLM:
  *
  *   h_k(x) = sigmoid(b_k + βᵀx)
  *
  * trained by PERSON-PERIOD EXPANSION (SURVEY §2.6 M4): each subject
  * with duration bin k_i explodes into rows j = 0..k_i with binary
  * label "died in interval j" (1 only at j = k_i when e = 1), then one
  * MLlib LogisticRegression with interval one-hots + shared covariate
  * slope — fully built-in, distributed, no custom gradient code.
  *
  * Duration cuts are fitted on the TRAIN outcome (equidistant,
  * dataset.py:122-132); prediction interpolates the discrete survival
  * curve linearly (M6), S(τ) through knots (0,1),(cut_k, S_k).
  *
  * Scale shape: the explosion multiplies rows by ≤ numDurations (a
  * constant, default 10) — linear blowup, shuffle-free (explode is a
  * generator); MLlib LR then owns the distributed optimization.
  */
final case class LogisticHazard(
    numDurations: Int = 10, // model_logistic_hazard.py:27
    maxIter: Int = 100,
    regParam: Double = 1e-4) extends SurvModel {

  def name: String = "logistic_hazard"

  def hyperparameterSpace: Seq[Param] = Seq(
    FloatP("reg_param", 1e-6, 1e-1),
    IntegerP("max_iter", 50, 200, 50))

  def fit(ds: SurvDataset): FittedLogisticHazard = {
    val cuts = DurationCuts.fit(ds.train, ds.timeCol, numDurations)
    val k = cuts.k
    val train = ds.tensorized(ds.train)
      .select(transform(col("x"), _.cast("double")).as("x"),
        cuts.indexCol(col("t")).as("t_idx"), col("e"))

    val pp = train
      .select(col("x"), col("t_idx"), col("e"),
        explode(sequence(lit(0), col("t_idx"))).as("j"))
      .select(
        when(col("j") === col("t_idx") && col("e") === 1, 1.0)
          .otherwise(0.0).as("label"),
        array_to_vector(concat(
          array((0 until k).map(i =>
            when(col("j") === i, 1.0).otherwise(0.0)): _*),
          col("x"))).as("features"))

    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFitIntercept(false) // interval one-hots span the intercept
      .setStandardization(true)
    val m = lr.fit(pp)
    val w = m.coefficients.toArray
    FittedLogisticHazard(this, cuts, w.take(k), w.drop(k))
  }
}

/** Fitted discrete hazard: interval intercepts b (one per cut) and the
  * shared covariate slope β, both in original feature space (MLlib LR
  * de-standardizes its coefficients).
  */
final case class FittedLogisticHazard(
    model: LogisticHazard,
    cuts: DurationCuts,
    b: Array[Double],
    beta: Array[Double]) extends FittedSurvModel {

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Per-row array of hazards h_k = sigmoid(b_k + βᵀx); βᵀx let-bound
    * so the dot product runs once per row, not once per interval.
    */
  def hazards(x: Column): Column =
    graft.functions.Let.bind(CoxPH.scoreCol(x, beta)) { bx =>
      transform(array(b.map(lit(_)): _*), bk => sigmoid(bk + bx))
    }

  /** Per-row array of discrete survival values S_k = Π_{j<=k}(1−h_j)
    * as ONE running fold (K elements, not K aggregate(slice) passes);
    * the running product associates identically to the per-k slice
    * products, so values are bit-equal to the old form. Callers that
    * also need the hazards should compute them into a column and pass
    * it to [[survFromHazards]].
    */
  def discreteSurv(x: Column): Column = survFromHazards(hazards(x))

  /** [[discreteSurv]] over an already-computed hazards array column. */
  def survFromHazards(h: Column): Column =
    aggregate(h,
      struct(lit(1.0).as("q"), array().cast("array<double>").as("out")),
      (acc, hj) => {
        val q = acc.getField("q") * (lit(1.0) - hj)
        struct(q.as("q"),
          concat(acc.getField("out"), array(q)).as("out"))
      },
      acc => acc.getField("out"))

  def predictSurv(tensorized: DataFrame, grid: Array[Double]): DataFrame = {
    val spark = tensorized.sparkSession
    import spark.implicits._
    val g = grid.zipWithIndex.map(p => (p._2, p._1)).toSeq.toDF("tau_idx", "tau")
    val knots = 0.0 +: cuts.cuts.toSeq
    val xd = transform(col("x"), _.cast("double"))
    tensorized
      .select(col("id"),
        concat(array(lit(1.0)), discreteSurv(xd)).as("sv"))
      .crossJoin(broadcast(g))
      .select(col("id"), col("tau_idx"), col("tau"),
        Interpolation.linearAt(col("tau"), knots.toArray, col("sv")).as("s"))
  }
}
