package graft.model

import graft.SparkTestBase
import graft.surv.{Gbsg2Fixture, SurvDataset}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md tier-3 stat smoke: the deterministic GBSG2-SCHEMA
  * fixture ([[Gbsg2Fixture]] — mixed categorical + numeric
  * covariates, German Breast Cancer Study shape, 686 rows like the
  * real table) with a planted proportional-hazards signal; linear
  * CoxPH must reach c-index ≥ 0.6 through the full pipeline (feature
  * inference, one-hot, ordered split, train, score).
  */
class Gbsg2FixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def gbsg2Like(n: Int = 686) = Gbsg2Fixture.frame(spark, n)

  test("GBSG2-schema: CoxPH c-index >= 0.6 end-to-end") {
    val df = gbsg2Like()
    val feats = df.columns.toSeq.diff(Seq("pid", "time", "cens")).sorted
    val ds = SurvDataset.fromDataFrame(df, Seq(col("pid")), "time", "cens",
      features = Some(feats))
    // categorical expansion matches sklearn naming
    assert(ds.encodedFeatures.contains("horTh_yes") &&
      ds.encodedFeatures.contains("tgrade_III") &&
      ds.encodedFeatures.contains("menostat_Post"))
    val fitted = CoxPH(maxIter = 60).fit(ds)
    val scores = fitted.score(ds)
    assert(scores("c_index") >= 0.6, s"c_index=${scores("c_index")}")
    assert(scores("brier_score") < 0.3, s"brier=${scores("brier_score")}")
    // planted signs recovered (standardized space preserves sign)
    def b(name: String) = fitted.beta(ds.encodedFeatures.indexOf(name))
    assert(b("pnodes") > 0.0 && b("tgrade_III") > 0.0)
    assert(b("horTh_yes") < 0.0 && b("progrec") < 0.0)
  }

  test("GBSG2-schema: reference-default CoxMlp([32,32]) reaches linear-c") {
    // the planted signal is LINEAR, so the MLP can't beat the linear
    // model here — the bar is that the reference-shaped net trains
    // end-to-end on mixed one-hot + numeric covariates and lands in
    // the same c-index range, not at chance
    val df = gbsg2Like()
    val feats = df.columns.toSeq.diff(Seq("pid", "time", "cens")).sorted
    val ds = SurvDataset.fromDataFrame(df, Seq(col("pid")), "time", "cens",
      features = Some(feats))
    val fitted = CoxMlp(hidden = Seq(32, 32), epochs = 30, lr = 0.01).fit(ds)
    val scores = fitted.score(ds)
    fitted.release()
    assert(scores("c_index") >= 0.6, s"c_index=${scores("c_index")}")
    assert(scores("brier_score") < 0.3, s"brier=${scores("brier_score")}")
  }
}
