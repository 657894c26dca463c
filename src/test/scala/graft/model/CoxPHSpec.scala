package graft.model

import graft.SparkTestBase
import graft.surv.SurvDataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Tier-3 statistical smoke (SURVEY §5): the trainer must recover a
  * known signal from a synthetic proportional-hazards fixture and
  * score well above chance; plus flagship-style wiring on the tiny
  * churn data.
  */
class CoxPHSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** n subjects, x ~ U(-1,1)², true β = (1, -0.5), exponential event
    * times with rate e^{βx}, uniform administrative censoring.
    */
  private def fixture(n: Int) = {
    import spark.implicits._
    val rng = new Random(42)
    val rows = (0 until n).map { i =>
      val x1 = rng.nextDouble() * 2 - 1
      val x2 = rng.nextDouble() * 2 - 1
      val rate = math.exp(1.0 * x1 - 0.5 * x2)
      val tEvent = -math.log(rng.nextDouble()) / rate
      val cens = rng.nextDouble() * 3.0
      val t = math.min(tEvent, cens)
      val e = if (tEvent <= cens) 1 else 0
      (i.toLong, x1, x2, t, e)
    }
    rows.toDF("idx", "x1", "x2", "time", "event")
  }

  test("recovers known beta on synthetic PH data and scores c>0.6") {
    val df = fixture(1200)
    val ds = SurvDataset.fromDataFrame(df, Seq(col("idx")), "time", "event",
      features = Some(Seq("x1", "x2")))
    val fitted = CoxPH(maxIter = 60, l2 = 1e-6).fit(ds)

    // β is in standardized space: expect ≈ β_true · sd(x)
    val expected = Seq(1.0 * fitted.sd(0), -0.5 * fitted.sd(1))
    assert(math.abs(fitted.beta(0) - expected.head) < 0.15,
      s"beta0=${fitted.beta(0)} expected≈${expected.head}")
    assert(math.abs(fitted.beta(1) - expected(1)) < 0.15,
      s"beta1=${fitted.beta(1)} expected≈${expected(1)}")

    val scores = fitted.score(ds)
    assert(scores("c_index") > 0.6, s"c_index=${scores("c_index")}")
    assert(scores("brier_score") > 0.0 && scores("brier_score") < 0.25,
      s"brier=${scores("brier_score")}")
  }

  test("flagship slice: churn sf0.001 end-to-end train+score") {
    val ds = graft.surv.ChurnView.dataset(spark, "/root/testdata/sf0.001")
    val fitted = CoxPH(maxIter = 25).fit(ds)
    val scores = fitted.score(ds)
    assert(scores.contains("c_index") && scores.contains("brier_score"))
    assert(scores("c_index") >= 0.0 && scores("c_index") <= 1.0)
    // survival matrix sanity: monotone non-increasing over the grid
    val test = ds.tensorized(ds.test).withColumnRenamed("rn", "id")
    val grid = graft.eval.BrierScore.defaultGrid(test, "t")
    val surv = fitted.predictSurv(test, grid)
    val perId = surv.orderBy("id", "tau_idx").collect()
      .groupBy(_.getLong(0)).values
    assert(perId.forall { rows =>
      val ss = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      ss.sliding(2).forall { case Array(a, b) => b <= a + 1e-12; case _ => true }
    })
  }
}
