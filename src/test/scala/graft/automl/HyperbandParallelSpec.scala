package graft.automl

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import graft.model.{FittedSurvModel, FloatP, Param, SurvModel}
import graft.surv.SurvDataset
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Parallel rung evaluation: 2+ configs train CONCURRENTLY, and the
  * selection (winner, params, score, per-model bests incl. quirk H4)
  * is identical to the sequential run — the concurrency only fans out
  * the pure train+score work; sampling and the best fold stay
  * sequential in config order.
  */
class HyperbandParallelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tinyDs: SurvDataset = {
    import spark.implicits._
    val rng = new Random(3)
    val rows = (0 until 40).map { i =>
      (i.toLong, rng.nextDouble(), rng.nextDouble() * 2.0, rng.nextInt(2))
    }
    SurvDataset.fromDataFrame(rows.toDF("idx", "x1", "time", "event"),
      Seq(col("idx")), "time", "event", features = Some(Seq("x1")))
  }

  /** Deterministic param-keyed score, no Spark work; `active` tracks
    * in-flight fits, `maxActive` the high-water mark.
    */
  private final class StubFactory(
      val name: String,
      active: AtomicInteger, maxActive: AtomicInteger,
      sleepMs: Long) extends ModelFactory {
    val space: Seq[Param] = Seq(FloatP("lr", 0.0, 1.0))
    def build(params: Map[String, Any], epochs: Int): SurvModel = new SurvModel {
      def name: String = StubFactory.this.name
      def hyperparameterSpace: Seq[Param] = space
      def fit(ds: SurvDataset): FittedSurvModel = {
        val now = active.incrementAndGet()
        maxActive.getAndUpdate(m => math.max(m, now))
        try {
          Thread.sleep(sleepMs)
          val lr = params.getOrElse("lr", 0.5).asInstanceOf[Double]
          // stable, param+epoch-keyed, in (0, 1)
          val c = 0.5 + 0.4 * math.sin(lr * 37.0 + epochs * 0.11 +
            (if (StubFactory.this.name == "stub_b") 1.3 else 0.0))
          new FittedSurvModel {
            def predictSurv(t: DataFrame, g: Array[Double]): DataFrame =
              throw new UnsupportedOperationException("stub")
            override def score(ds: SurvDataset): Map[String, Double] =
              Map("c_index" -> c, "brier_score" -> 0.1)
          }
        } finally { active.decrementAndGet(); () }
      }
    }
  }

  private def run(parallelism: Int, maxActive: AtomicInteger) = {
    val active = new AtomicInteger(0)
    val seeds = Seq(
      new StubFactory("stub_a", active, maxActive, sleepMs = 120),
      new StubFactory("stub_b", active, maxActive, sleepMs = 120))
    val hb = new Hyperband(seeds = seeds, maxIter = 9, eta = 3,
      outputEpochs = 11, seedRng = 42L, parallelism = parallelism)
    hb.selectModel(tinyDs)
    (hb.bestScore, hb.bestModel.map(_.name), hb.bestParams,
      hb.modelBestScore.toMap)
  }

  test("parallel rung evaluation overlaps fits and matches sequential selection") {
    val maxSeq = new AtomicInteger(0)
    val seq = run(parallelism = 1, maxSeq)
    val maxPar = new AtomicInteger(0)
    val par = run(parallelism = 4, maxPar)

    assert(maxSeq.get() == 1, s"sequential overlap: ${maxSeq.get()}")
    assert(maxPar.get() >= 2,
      s"expected 2+ concurrent fits, saw ${maxPar.get()}")
    assert(par == seq, s"parallel selection diverged:\n  par=$par\n  seq=$seq")
  }

  test("REAL models: parallel winner bit-identical to sequential " +
    "(churn sf0.001, reduced schedule)") {
    // the stub test proves the concurrency mechanics; this one proves
    // the real trainers (distributed gradients, TrainCache sharing,
    // FAIR-pool job interleaving) stay bit-deterministic under
    // concurrency — the at-scale fold VERDICT r9 asked to prove with
    // real fits (the sf0.1 wall-time record lives in BASELINE.md)
    def real(parallelism: Int) = {
      val ds = graft.surv.ChurnView.dataset(spark, "/root/testdata/sf0.001")
      val hb = new Hyperband(maxIter = 9, eta = 3, outputEpochs = 11,
        seedRng = 42L, parallelism = parallelism)
      val fitted = hb.selectModel(ds)
      val out = (hb.bestScore, hb.bestModel.map(_.name), hb.bestParams,
        hb.modelBestScore.toMap, hb.seeds.map(_.name))
      fitted.release()
      out
    }
    val seq = real(1)
    val par = real(4)
    assert(par == seq,
      s"real-model parallel selection diverged:\n  par=$par\n  seq=$seq")
    assert(seq._1 > Double.NegativeInfinity && seq._2.nonEmpty)
  }
}
