package graft.model

import graft.SparkTestBase
import graft.surv.SurvDataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class DiscreteModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def fixture(n: Int) = {
    import spark.implicits._
    val rng = new Random(7)
    val rows = (0 until n).map { i =>
      val x1 = rng.nextDouble() * 2 - 1
      val x2 = rng.nextDouble() * 2 - 1
      val rate = math.exp(1.0 * x1 - 0.5 * x2)
      val tEvent = -math.log(rng.nextDouble()) / rate
      val cens = rng.nextDouble() * 3.0
      (i.toLong, x1, x2, math.min(tEvent, cens), if (tEvent <= cens) 1 else 0)
    }
    rows.toDF("idx", "x1", "x2", "time", "event")
  }

  private def ds(n: Int) = SurvDataset.fromDataFrame(fixture(n),
    Seq(col("idx")), "time", "event", features = Some(Seq("x1", "x2")))

  test("DeepHit loss gradient matches finite differences") {
    val k = 3; val p = 2
    val rng = new Random(1)
    val batch = Array.tabulate(6)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        rng.nextInt(k), rng.nextInt(2)))
    val theta = Array.fill(k * (p + 1))(rng.nextDouble() * 0.5 - 0.25)

    def lossAt(th: Array[Double]): Double = {
      val acc = DeepHit.PartitionAcc(k, p, th, alpha = 0.3, sigma = 0.2)
      acc.addBatch(batch)
      acc.loss
    }
    val acc = DeepHit.PartitionAcc(k, p, theta, alpha = 0.3, sigma = 0.2)
    acc.addBatch(batch)
    val eps = 1e-6
    theta.indices.foreach { i =>
      val up = theta.clone(); up(i) += eps
      val dn = theta.clone(); dn(i) -= eps
      val num = (lossAt(up) - lossAt(dn)) / (2 * eps)
      assert(math.abs(num - acc.grad(i)) < 1e-4 * math.max(1.0, math.abs(num)),
        s"grad($i): analytic=${acc.grad(i)} numeric=$num")
    }
  }

  test("LogisticHazard learns signal: c_index > 0.6, monotone survival") {
    val d = ds(1200)
    val fitted = LogisticHazard(numDurations = 10, maxIter = 60).fit(d)
    val scores = fitted.score(d)
    assert(scores("c_index") > 0.6, s"c=${scores("c_index")}")
    val test = d.tensorized(d.test).withColumnRenamed("rn", "id")
    val sv = test.select(
      fitted.discreteSurv(transform(col("x"), _.cast("double"))).as("sv"))
      .head().getSeq[Double](0)
    assert(sv.sliding(2).forall { case Seq(a, b) => b <= a + 1e-12; case _ => true })
  }

  test("DeepHit learns signal: c_index > 0.6, pmf sums to 1") {
    val d = ds(1200)
    val fitted = DeepHit(numDurations = 10, epochs = 40, lr = 0.1).fit(d)
    val scores = fitted.score(d)
    assert(scores("c_index") > 0.6, s"c=${scores("c_index")}")
    val test = d.tensorized(d.test).withColumnRenamed("rn", "id")
    val pmf = test.select(
      fitted.pmf(transform(col("x"), _.cast("double"))).as("p"))
      .head().getSeq[Double](0)
    assert(math.abs(pmf.sum - 1.0) < 1e-9)
  }

  test("MLP gradient matches finite differences (hidden layer, M9)") {
    val k = 3; val p = 2; val h = 4
    val rng = new Random(3)
    val batch = Array.tabulate(6)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        rng.nextInt(k), rng.nextInt(2)))
    // θ = [c (k), W (k×h), A (h×p), a (h)]
    val theta = Array.fill(k + k * h + h * p + h)(rng.nextDouble() * 0.5 - 0.25)

    def lossAt(th: Array[Double]): Double = {
      val acc = DeepHit.PartitionAcc(k, p, th, alpha = 0.3, sigma = 0.2, hidden = Seq(h))
      acc.addBatch(batch)
      acc.loss
    }
    val acc = DeepHit.PartitionAcc(k, p, theta, alpha = 0.3, sigma = 0.2, hidden = Seq(h))
    acc.addBatch(batch)
    val eps = 1e-6
    theta.indices.foreach { i =>
      val up = theta.clone(); up(i) += eps
      val dn = theta.clone(); dn(i) -= eps
      val num = (lossAt(up) - lossAt(dn)) / (2 * eps)
      assert(math.abs(num - acc.grad(i)) < 1e-4 * math.max(1.0, math.abs(num)),
        s"grad($i): analytic=${acc.grad(i)} numeric=$num")
    }
  }

  test("two-layer MLP gradient matches finite differences ([h1,h2], M9)") {
    val k = 3; val p = 2; val h1 = 4; val h2 = 3
    val rng = new Random(5)
    val batch = Array.tabulate(6)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        rng.nextInt(k), rng.nextInt(2)))
    // θ = [c (k), W (k×h2), A1 (h1×p), b1 (h1), A2 (h2×h1), b2 (h2)]
    val len = k + k * h2 + h1 * p + h1 + h2 * h1 + h2
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)

    def lossAt(th: Array[Double]): Double = {
      val acc = DeepHit.PartitionAcc(k, p, th, alpha = 0.3, sigma = 0.2,
        hidden = Seq(h1, h2))
      acc.addBatch(batch)
      acc.loss
    }
    val acc = DeepHit.PartitionAcc(k, p, theta, alpha = 0.3, sigma = 0.2,
      hidden = Seq(h1, h2))
    acc.addBatch(batch)
    val eps = 1e-6
    theta.indices.foreach { i =>
      val up = theta.clone(); up(i) += eps
      val dn = theta.clone(); dn(i) -= eps
      val num = (lossAt(up) - lossAt(dn)) / (2 * eps)
      assert(math.abs(num - acc.grad(i)) < 1e-4 * math.max(1.0, math.abs(num)),
        s"grad($i): analytic=${acc.grad(i)} numeric=$num")
    }
  }

  test("reference-default [32,32] stack trains and beats the linear head") {
    import spark.implicits._
    // same V-shaped nonlinear risk as the single-layer test
    val rng = new Random(11)
    val rows = (0 until 600).map { i =>
      val x1 = 2 * rng.nextDouble() - 1
      val x2 = 2 * rng.nextDouble() - 1
      val rate = math.exp(3.0 * math.abs(x1) - 1.5) / 50.0
      val tEvent = -math.log(rng.nextDouble()) / rate
      val cens = 20 + rng.nextDouble() * 200
      (i.toLong, x1, x2, math.max(math.min(tEvent, cens), 0.5),
        if (tEvent <= cens) 1 else 0)
    }
    val d = SurvDataset.fromDataFrame(
      rows.toDF("idx", "x1", "x2", "time", "event"),
      Seq(col("idx")), "time", "event", features = Some(Seq("x1", "x2")))
    val cLin = DeepHit(numDurations = 5, epochs = 40, lr = 0.1)
      .fit(d).score(d)("c_index")
    val c3232 = DeepHit(numDurations = 5, epochs = 40, lr = 0.05,
      hidden = Seq(32, 32)).fit(d).score(d)("c_index")
    assert(c3232 > cLin + 0.05, s"c3232=$c3232 cLin=$cLin")
    assert(c3232 > 0.6, s"c3232=$c3232")
  }

  test("MLP head captures a nonlinear signal the linear head cannot (M9)") {
    import spark.implicits._
    // V-shaped risk: lp = 3·|x1| has ZERO linear correlation with x1,
    // so the linear head scores ~0.5 while one ReLU layer represents
    // |x1| exactly (relu(x1) + relu(-x1)).
    val rng = new Random(11)
    val rows = (0 until 600).map { i =>
      val x1 = 2 * rng.nextDouble() - 1
      val x2 = 2 * rng.nextDouble() - 1
      val rate = math.exp(3.0 * math.abs(x1) - 1.5) / 50.0
      val tEvent = -math.log(rng.nextDouble()) / rate
      val cens = 20 + rng.nextDouble() * 200
      (i.toLong, x1, x2, math.max(math.min(tEvent, cens), 0.5),
        if (tEvent <= cens) 1 else 0)
    }
    val d = SurvDataset.fromDataFrame(
      rows.toDF("idx", "x1", "x2", "time", "event"),
      Seq(col("idx")), "time", "event", features = Some(Seq("x1", "x2")))
    val cLin = DeepHit(numDurations = 5, epochs = 40, lr = 0.1).fit(d).score(d)("c_index")
    val cMlp = DeepHit(numDurations = 5, epochs = 40, lr = 0.1, hidden = Seq(8))
      .fit(d).score(d)("c_index")
    assert(cMlp > cLin + 0.05, s"cMlp=$cMlp cLin=$cLin")
    assert(cMlp > 0.6, s"cMlp=$cMlp")
  }

  test("Hyperband end-to-end with tiny budget selects and refits a model") {
    val d = ds(300)
    val hb = new graft.automl.Hyperband(maxIter = 2, eta = 2, outputEpochs = 5)
    val fitted = hb.selectModel(d)
    assert(hb.bestScore > -1.0 && hb.bestModel.nonEmpty)
    assert(hb.seeds.size <= 2) // truncated to 2 best names (H4)
    val scores = fitted.score(d)
    assert(scores.contains("c_index") && scores.contains("brier_score"))
  }

  test("Hyperband searches the MLP seeds (reference-shaped model list)") {
    val d = ds(300)
    val hb = new graft.automl.Hyperband(
      seeds = graft.automl.ModelFactory.mlpSeeds(hidden = Seq(4)),
      maxIter = 2, eta = 2, outputEpochs = 3)
    val fitted = hb.selectModel(d)
    assert(hb.bestScore > -1.0)
    assert(Set("cox_ph_mlp", "deephit_mlp", "logistic_hazard_mlp")
      .contains(hb.bestModel.map(_.name).getOrElse("")))
    val scores = fitted.score(d)
    assert(scores.contains("c_index") && scores("c_index") > 0.4)
  }

  test("Hyperband schedule matches the reference float formulas") {
    // cross-check exact-integer schedule vs the float computation
    val sched = graft.automl.Hyperband.scheduleExact(81, 3)
    val expected = for {
      s <- 4 to 0 by -1
      n = math.ceil(405.0 / 81 / (s + 1) * math.pow(3, s)).toInt
      i <- 0 to s
    } yield (s, i, math.ceil(n * math.pow(3.0, -i)).toInt,
      (81 * math.pow(3.0, -s) * math.pow(3.0, i)).toInt)
    assert(sched == expected)
  }
}
