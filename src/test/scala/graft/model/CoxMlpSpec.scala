package graft.model

import graft.SparkTestBase
import graft.surv.SurvDataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class CoxMlpSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("batch partial likelihood matches a hand computation (ties included)") {
    // linear head (no hidden): g = w·x; 3 rows, t = (5, 3, 3), events
    // at rows 0 and 1. Risk sets: row0 {0}; row1 {0,1,2} (tie with
    // row 2 included).
    val w = Array(0.5, -0.25)
    val batch = Array(
      (0L, Array(1.0, 2.0), 5.0, 1),
      (1L, Array(0.5, 1.0), 3.0, 1),
      (2L, Array(-1.0, 0.0), 3.0, 0))
    def g(x: Array[Double]) = w(0) * x(0) + w(1) * x(1)
    val s0 = math.exp(g(batch(0)._2))
    val s1 = s0 + math.exp(g(batch(1)._2)) + math.exp(g(batch(2)._2))
    val want = (math.log(s0) - g(batch(0)._2)) + (math.log(s1) - g(batch(1)._2))
    val acc = CoxMlp.PartitionAcc(2, w)
    acc.addBatch(batch)
    assert(math.abs(acc.loss - want) < 1e-12)
    assert(acc.events == 2L)
  }

  test("gradient matches finite differences (two-layer stack)") {
    val p = 2; val h = Seq(3, 2)
    val rng = new Random(9)
    val batch = Array.tabulate(7)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        // a few deliberate duration ties to exercise the tie algebra
        (1 + i % 3).toDouble, rng.nextInt(2)))
    val len = 2 + (3 * p + 3) + (2 * 3 + 2)
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)
    def lossAt(th: Array[Double]): Double = {
      val acc = CoxMlp.PartitionAcc(p, th, h)
      acc.addBatch(batch)
      acc.loss
    }
    val acc = CoxMlp.PartitionAcc(p, theta, h)
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

  test("logistic-hazard MLP gradient matches finite differences") {
    val k = 4; val p = 2; val h = Seq(3)
    val rng = new Random(13)
    val batch = Array.tabulate(6)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        rng.nextInt(k), rng.nextInt(2)))
    val len = k + k * 3 + (3 * p + 3)
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)
    def lossAt(th: Array[Double]): Double = {
      val acc = LogisticHazardMlp.PartitionAcc(k, p, th, h)
      acc.addBatch(batch)
      acc.loss
    }
    val acc = LogisticHazardMlp.PartitionAcc(k, p, theta, h)
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

  test("logistic-hazard MLP captures a nonlinear signal") {
    import spark.implicits._
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
    val cLin = LogisticHazard(numDurations = 5).fit(d).score(d)("c_index")
    val cMlp = LogisticHazardMlp(numDurations = 5, hidden = Seq(8),
      epochs = 40, lr = 0.1).fit(d).score(d)("c_index")
    assert(cMlp > cLin + 0.05, s"cMlp=$cMlp cLin=$cLin")
    assert(cMlp > 0.6, s"cMlp=$cMlp")
  }

  test("neural Cox captures a nonlinear signal the linear Cox cannot") {
    import spark.implicits._
    // V-shaped risk lp = 3·|x1|: zero linear correlation with x1
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
    val fLin = CoxPH().fit(d)
    val cLin = fLin.score(d)("c_index")
    fLin.release()
    val fMlp = CoxMlp(hidden = Seq(8), epochs = 40, lr = 0.05).fit(d)
    val cMlp = fMlp.score(d)("c_index")
    fMlp.release()
    assert(cMlp > cLin + 0.05, s"cMlp=$cMlp cLin=$cLin")
    assert(cMlp > 0.6, s"cMlp=$cMlp")
  }

  test("batch-norm gradient matches finite differences (affine frozen-stats)") {
    val p = 2; val h = Seq(3, 2)
    val rng = new Random(17)
    val batch = Array.tabulate(7)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        (1 + i % 3).toDouble, rng.nextInt(2)))
    // θ = [w (2), A1(3×2)+b1(3)+γ1(3)+β1(3), A2(2×3)+b2(2)+γ2(2)+β2(2)]
    val len = 2 + (3 * p + 3 + 6) + (2 * 3 + 2 + 4)
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)
    def lossAt(th: Array[Double]): Double = {
      val acc = CoxMlp.PartitionAcc(p, th, h, bn = true)
      acc.addBatch(batch)
      acc.loss
    }
    val acc = CoxMlp.PartitionAcc(p, theta, h, bn = true)
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

  test("batch-norm folds exactly into the extracted prediction layers") {
    val p = 3; val h = Seq(4, 2)
    val rng = new Random(23)
    val stack = new MlpStack(p, h, 0, bn = true)
    val theta = new Array[Double](stack.size)
    stack.init(theta, rng)
    // perturb γ/β off identity so the fold is non-trivial
    theta.indices.foreach(i => theta(i) += rng.nextDouble() * 0.3 - 0.15)
    val x = Array.fill(p)(rng.nextDouble() * 2 - 1)
    val trained = stack.forward(theta, x)(stack.nL).take(stack.outWidth)
    // replay the folded layers with a PLAIN stack (the prediction shape)
    val folded = stack.extract(theta)
    var acc = x
    folded.foreach { case (a, b) =>
      acc = Array.tabulate(a.length)(j =>
        math.max(0.0, b(j) + a(j).indices.map(m => a(j)(m) * acc(m)).sum))
    }
    trained.zip(acc).foreach { case (tr, pr) =>
      assert(math.abs(tr - pr) < 1e-12, s"fold mismatch: $tr vs $pr")
    }
  }

  test("batch-stats BN gradient matches finite differences (CoxMlp)") {
    // true BatchNorm1d train mode: the loss couples rows through the
    // batch mean/variance; the analytic gradient must carry the
    // ∂μ/∂σ² terms (a frozen-stats gradient fails this check).
    val p = 2; val h = Seq(3, 2)
    val rng = new Random(43)
    val batch = Array.tabulate(7)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        (1 + i % 3).toDouble, rng.nextInt(2)))
    val len = 2 + (3 * p + 3 + 6) + (2 * 3 + 2 + 4)
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)
    def lossAt(th: Array[Double]): Double = {
      val acc = CoxMlp.PartitionAcc(p, th, h, bn = true, bnBatch = true)
      acc.addBatch(batch)
      acc.loss
    }
    val acc = CoxMlp.PartitionAcc(p, theta, h, bn = true, bnBatch = true)
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

  test("batch-stats BN + dropout gradient matches finite differences (DeepHit)") {
    val k = 4; val p = 2; val h = Seq(3)
    val rng = new Random(47)
    val batch = Array.tabulate(6)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        rng.nextInt(k), rng.nextInt(2)))
    val len = k + k * 3 + (3 * p + 3 + 6)
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)
    val key = MlpStack.mixKey(53L, 2L)
    def accAt(th: Array[Double]) = {
      val a = DeepHit.PartitionAcc(k, p, th, alpha = 0.3, sigma = 0.5, h,
        bn = true, dropout = 0.25, dropKey0 = key, bnBatch = true)
      a.addBatch(batch)
      a
    }
    val acc = accAt(theta)
    val eps = 1e-6
    theta.indices.foreach { i =>
      val up = theta.clone(); up(i) += eps
      val dn = theta.clone(); dn(i) -= eps
      val num = (accAt(up).loss - accAt(dn).loss) / (2 * eps)
      assert(math.abs(num - acc.grad(i)) < 1e-4 * math.max(1.0, math.abs(num)),
        s"grad($i): analytic=${acc.grad(i)} numeric=$num")
    }
  }

  test("batch-stats BN gradient matches finite differences (LogisticHazardMlp)") {
    val k = 4; val p = 2; val h = Seq(3)
    val rng = new Random(59)
    val batch = Array.tabulate(6)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        rng.nextInt(k), rng.nextInt(2)))
    val len = k + k * 3 + (3 * p + 3 + 6)
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)
    def lossAt(th: Array[Double]): Double = {
      val acc = LogisticHazardMlp.PartitionAcc(k, p, th, h, bn = true,
        bnBatch = true)
      acc.addBatch(batch)
      acc.loss
    }
    val acc = LogisticHazardMlp.PartitionAcc(k, p, theta, h, bn = true,
      bnBatch = true)
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

  test("population-stats fold equals the eval-chain forward") {
    // extract(θ, stats) must reproduce BN eval mode exactly: compare
    // the folded plain-layer replay against preactEval's last-layer
    // normalization applied by hand.
    val p = 3; val h = Seq(4, 2)
    val rng = new Random(61)
    val stack = new MlpStack(p, h, 0, bn = true, bnBatch = true)
    val theta = new Array[Double](stack.size)
    stack.init(theta, rng)
    theta.indices.foreach(i => theta(i) += rng.nextDouble() * 0.3 - 0.15)
    val stats = Array.tabulate(h.length)(l =>
      (Array.fill(stack.widths(l))(rng.nextDouble() * 0.4 - 0.2),
        Array.fill(stack.widths(l))(rng.nextDouble() * 0.5 + 0.1)))
    val x = Array.fill(p)(rng.nextDouble() * 2 - 1)
    // eval chain by definition: normalize the last layer's preact
    val zTop = stack.preactEval(theta, x, stats, h.length - 1)
    val l = h.length - 1
    val want = Array.tabulate(stack.widths(l)) { j =>
      val zh = (zTop(j) - stats(l)._1(j)) /
        math.sqrt(stats(l)._2(j) + MlpStack.BnEps)
      math.max(0.0, theta(stack.offG(l) + j) * zh + theta(stack.offBt(l) + j))
    }
    // folded replay
    val folded = stack.extract(theta, Some(stats))
    var acc = x
    folded.foreach { case (a, b) =>
      acc = Array.tabulate(a.length)(j =>
        math.max(0.0, b(j) + a(j).indices.map(m => a(j)(m) * acc(m)).sum))
    }
    want.zip(acc).foreach { case (w, g) =>
      assert(math.abs(w - g) < 1e-12, s"eval fold mismatch: $w vs $g")
    }
  }

  test("batch-norm neural Cox trains with batch statistics and still learns") {
    import spark.implicits._
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
    val f = CoxMlp(hidden = Seq(8), epochs = 40, lr = 0.05,
      batchNorm = true).fit(d)
    val c = f.score(d)("c_index")
    f.release()
    assert(c > 0.6, s"c=$c")
  }

  test("dropout gradient matches finite differences (fixed mask key)") {
    // masks are a pure hash of (dropKey, layer, unit) — θ-free — so
    // the masked loss is still exactly differentiable at a fixed key
    val p = 2; val h = Seq(3, 2)
    val rng = new Random(29)
    val batch = Array.tabulate(7)(i =>
      (i.toLong, Array(rng.nextDouble(), rng.nextDouble()),
        (1 + i % 3).toDouble, rng.nextInt(2)))
    val len = 2 + (3 * p + 3) + (2 * 3 + 2)
    val theta = Array.fill(len)(rng.nextDouble() * 0.5 - 0.25)
    val key = MlpStack.mixKey(41L, 3L)
    def lossAt(th: Array[Double]): Double = {
      val acc = CoxMlp.PartitionAcc(p, th, h, dropout = 0.3, dropKey0 = key)
      acc.addBatch(batch)
      acc.loss
    }
    val acc = CoxMlp.PartitionAcc(p, theta, h, dropout = 0.3, dropKey0 = key)
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

  test("dropout mask semantics: deterministic, scaled, inference-free") {
    val p = 3; val h = Seq(16)
    val rng = new Random(31)
    val base = new MlpStack(p, h, 0)
    val drop = new MlpStack(p, h, 0, dropout = 0.4)
    val theta = new Array[Double](base.size)
    base.init(theta, rng)
    val x = Array.fill(p)(rng.nextDouble() * 2 - 1)
    val plain = base.forward(theta, x)(1)
    val key = MlpStack.mixKey(7L, 12L)
    val masked = drop.forward(theta, x, key)
    // same key → identical masks; every unit is either exactly 0
    // (dropped or inactive) or the plain activation / (1−q)
    assert(masked(1).sameElements(drop.forward(theta, x, key)(1)))
    val scale = 1.0 / 0.6
    var dropped = 0
    plain.indices.foreach { j =>
      if (masked(1)(j) == 0.0) { if (plain(j) > 0.0) dropped += 1 }
      else assert(math.abs(masked(1)(j) - plain(j) * scale) < 1e-15)
    }
    assert(dropped > 0, "q=0.4 over 16 units should drop something")
    // a different key draws a different mask (16 units at q=0.4)
    val other = drop.forward(theta, x, MlpStack.mixKey(7L, 13L))(1)
    assert(!other.sameElements(masked(1)))
    // dropout = 0 through the same code path is bit-equal to base
    val zero = new MlpStack(p, h, 0, dropout = 0.0).forward(theta, x, key)(1)
    assert(zero.sameElements(plain))
    // the prediction path (extract) never masks: same folded layers
    drop.extract(theta).zip(base.extract(theta)).foreach { case ((a1, b1), (a2, b2)) =>
      assert(b1.sameElements(b2))
      a1.indices.foreach(j => assert(a1(j).sameElements(a2(j))))
    }
  }

  test("dropout-regularized neural Cox still learns the nonlinear signal") {
    import spark.implicits._
    // same V-shaped risk as the plain MLP test; dropout = 0.1 is the
    // reference's default (model_cox_ph.py:21)
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
    val f = CoxMlp(hidden = Seq(8), epochs = 40, lr = 0.05, dropout = 0.1).fit(d)
    val c = f.score(d)("c_index")
    f.release()
    assert(c > 0.6, s"c=$c")
  }

  test("Hyperband MLP search includes batch_norm and completes") {
    import spark.implicits._
    val rng = new Random(5)
    val rows = (0 until 120).map { i =>
      val x1 = 2 * rng.nextDouble() - 1
      val rate = math.exp(1.2 * math.abs(x1) - 0.5)
      val tEvent = -math.log(rng.nextDouble()) / rate
      val cens = rng.nextDouble() * 3.0
      (i.toLong, x1, math.min(tEvent, cens), if (tEvent <= cens) 1 else 0)
    }
    val d = SurvDataset.fromDataFrame(rows.toDF("idx", "x1", "time", "event"),
      Seq(col("idx")), "time", "event", features = Some(Seq("x1")))
    val seeds = graft.automl.ModelFactory.mlpSeeds(hidden = Seq(4))
    assert(seeds.forall(_.space.exists(_.name == "batch_norm")))
    assert(seeds.forall(_.space.exists(_.name == "dropout")))
    val hb = new graft.automl.Hyperband(seeds = seeds, maxIter = 3, eta = 3,
      outputEpochs = 4, seedRng = 11L)
    val fitted = hb.selectModel(d)
    try {
      assert(hb.bestScore > Double.NegativeInfinity)
      assert(hb.bestModel.nonEmpty)
    } finally fitted.release()
  }
}
