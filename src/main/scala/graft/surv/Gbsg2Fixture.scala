package graft.surv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import scala.util.Random

/** Deterministic GBSG2-SCHEMA survival fixture (German Breast Cancer
  * Study shape: mixed categorical + numeric covariates, 686 rows like
  * the real table the reference's own CoxPH test trains on —
  * reference tests/models/test_cox_ph.py:9-16 via
  * lifelines.load_gbsg2). The REAL table isn't shippable (zero
  * egress), so this plants a proportional-hazards signal with the
  * same column names/dtypes: tumor grade and positive nodes raise
  * risk, hormone therapy and progesterone receptors lower it.
  *
  * Shared by Gbsg2FixtureSpec (tier-3 stat smoke: CoxPH must recover
  * the planted signs) and HyperbandBench's `gbsg2[:n]` pseudo-dir
  * (the ASHA-vs-sync quality check on a SECOND workload — VERDICT r13
  * item 6: the async path's parity claim rested on one dataset).
  */
object Gbsg2Fixture {

  val TimeCol = "time"
  val EventCol = "cens"

  /** Seeded generator — same draw sequence for any caller, so spec
    * assertions and bench runs see the identical table.
    */
  def frame(spark: SparkSession, n: Int = 686): DataFrame = {
    import spark.implicits._
    val rng = new Random(2024)
    val rows = (0 until n).map { i =>
      val horTh = if (rng.nextBoolean()) "yes" else "no"
      val age = 25 + rng.nextInt(50)
      val menostat = if (rng.nextBoolean()) "Pre" else "Post"
      val tsize = 5 + rng.nextInt(100)
      val tgrade = Seq("I", "II", "III")(rng.nextInt(3))
      val pnodes = 1 + rng.nextInt(30)
      val progrec = rng.nextInt(500)
      val estrec = rng.nextInt(500)
      // planted log-hazard: grade and nodes raise risk, hormone
      // therapy and progesterone receptors lower it
      val lp = 0.5 * (tgrade match {
        case "I" => -1.0; case "II" => 0.0; case _ => 1.0
      }) + 0.06 * pnodes - 0.4 * (if (horTh == "yes") 1.0 else 0.0) -
        0.002 * progrec
      // StrictMath, not Math: Math.exp/log may differ by an ulp
      // across JVMs/hardware (intrinsics), and an ulp at a .0
      // boundary would flip the toInt below — the fixture must be
      // bit-identical everywhere ("same table for any caller")
      val rate = StrictMath.exp(lp) / 1000.0
      val tEvent = -StrictMath.log(rng.nextDouble()) / rate
      val cens = 200 + rng.nextDouble() * 2400
      val time = math.min(tEvent, cens).toInt.max(1)
      val e = if (tEvent <= cens) 1 else 0
      (i.toLong, horTh, age, menostat, tsize, tgrade, pnodes, progrec,
        estrec, time, e)
    }
    rows.toDF("pid", "horTh", "age", "menostat", "tsize", "tgrade",
      "pnodes", "progrec", "estrec", TimeCol, EventCol)
  }

  /** The fixture as a [[SurvDataset]]: features inferred the
    * np.setdiff1d way (all columns minus id/time/event, sorted).
    */
  def dataset(spark: SparkSession, n: Int = 686,
              trainRatio: Double = 0.9): SurvDataset = {
    val df = frame(spark, n)
    val feats = df.columns.toSeq.diff(Seq("pid", TimeCol, EventCol)).sorted
    SurvDataset.fromDataFrame(df, Seq(col("pid")), TimeCol, EventCol,
      features = Some(feats), trainRatio = trainRatio)
  }
}
