package graft.model

import graft.SparkTestBase
import graft.surv.SurvDataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The bnEma flavor: torch BatchNorm1d momentum-EMA running stats as
  * the prediction-time BN statistics, beside the population-stats
  * default — formula checked against a hand-computed torch sequence,
  * and behavior checked on a real training fixture.
  */
class BnEmaSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("emaFold reproduces the hand-computed torch running-stats " +
    "sequence (momentum 0.1, rm=0/rv=1 init, unbiased batch var)") {
    // two layers (widths 2 and 1), three batches of hand-picked stats.
    // torch: rm' = 0.9·rm + 0.1·μ_b ; rv' = 0.9·rv + 0.1·σ²_b(unbiased)
    def b(mu1: Array[Double], v1: Array[Double],
          mu2: Array[Double], v2: Array[Double]) = Array(
      MlpStack.BnBatchStats(mu1, v1, 4), MlpStack.BnBatchStats(mu2, v2, 4))
    val batches = Seq(
      b(Array(1.0, -2.0), Array(4.0, 1.0), Array(0.5), Array(2.0)),
      b(Array(3.0, 0.0), Array(1.0, 9.0), Array(-1.5), Array(0.25)),
      b(Array(-1.0, 1.0), Array(0.5, 2.0), Array(2.0), Array(1.0)))
    val st = MlpStack.emaFold(batches, Seq(2, 1))
    // hand computation, batch by batch:
    // layer0 mean[0]: 0 -> .1        -> .09+.3=.39   -> .351-.1=.251
    // layer0 mean[1]: 0 -> -.2       -> -.18         -> -.162+.1=-.062
    // layer0 var[0]:  1 -> .9+.4=1.3 -> 1.17+.1=1.27 -> 1.143+.05=1.193
    // layer0 var[1]:  1 -> .9+.1=1.0 -> .9+.9=1.8    -> 1.62+.2=1.82
    // layer1 mean:    0 -> .05       -> .045-.15=-.105 -> -.0945+.2=.1055
    // layer1 var:     1 -> .9+.2=1.1 -> .99+.025=1.015 -> .9135+.1=1.0135
    val eps = 1e-12
    assert(math.abs(st(0)._1(0) - 0.251) < eps, st(0)._1(0))
    assert(math.abs(st(0)._1(1) - (-0.062)) < eps, st(0)._1(1))
    assert(math.abs(st(0)._2(0) - 1.193) < eps, st(0)._2(0))
    assert(math.abs(st(0)._2(1) - 1.82) < eps, st(0)._2(1))
    assert(math.abs(st(1)._1(0) - 0.1055) < eps, st(1)._1(0))
    assert(math.abs(st(1)._2(0) - 1.0135) < eps, st(1)._2(0))
  }

  test("per-partition affine composition reproduces the sequential " +
    "batch fold (carry-sized transfer, multi-partition fixture)") {
    // 3 "partitions" of 4/3/5 batches over widths (3, 2): the trainer
    // ships ONE (coeff, offset) map per partition and applies them in
    // partition order. Algebraically identical to folding all 12
    // batches sequentially; in IEEE arithmetic the reassociation may
    // differ by a few ulps (the recurrence contracts by 0.9 per
    // step), so the pin is 1e-12 — far under BN-stat significance —
    // NOT bit equality. Exactness pins that DO hold: an empty
    // partition is the identity map, and same-layout fits reuse the
    // same composed path bit-for-bit (reproducibility test below).
    val widths = Seq(3, 2)
    val rng = new Random(42)
    def batch() = widths.map(w => MlpStack.BnBatchStats(
      Array.fill(w)(4 * rng.nextDouble() - 2),
      Array.fill(w)(3 * rng.nextDouble() + 0.01), 8)).toArray
    val partitions = Seq(Seq.fill(4)(batch()), Seq.fill(3)(batch()),
      Seq.fill(5)(batch()))
    // sequential reference: all batches in (partition, batch) order
    val seqSt = MlpStack.emaFold(partitions.flatten, widths)
    // composed: one affine map per partition, applied in order to the
    // torch init state (rm = 0, rv = 1)
    val compSt = widths.map(w =>
      (new Array[Double](w), Array.fill(w)(1.0))).toArray
    partitions.foreach { p =>
      val (coeff, off) = MlpTrainer.composeAffine(p, widths)
      MlpTrainer.applyAffine(compSt, coeff, off)
    }
    seqSt.zip(compSt).foreach { case ((sm, sv), (cm, cv)) =>
      sm.zip(cm).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"mean $a vs $b") }
      sv.zip(cv).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"var $a vs $b") }
    }
    // an empty partition composes to the identity map
    val (c0, o0) = MlpTrainer.composeAffine(Seq.empty, widths)
    assert(c0 == 1.0 && o0.forall { case (m, v) =>
      m.forall(_ == 0.0) && v.forall(_ == 0.0) })
    val before = compSt.map { case (m, v) => (m.clone(), v.clone()) }
    MlpTrainer.applyAffine(compSt, c0, o0)
    compSt.zip(before).foreach { case ((m, v), (bm, bv)) =>
      assert(m.sameElements(bm) && v.sameElements(bv)) }
  }

  test("forwardBatch records UNBIASED batch variance for the EMA " +
    "while normalizing with the biased one") {
    // one layer, identity-ish weights: A = [[1],[2]], b = 0, γ = 1,
    // β = 0 → preactivations of unit j are j+1 times x
    val stack = new MlpStack(1, Seq(2), off = 0, bn = true, bnBatch = true)
    val theta = new Array[Double](stack.size)
    theta(stack.offA(0)) = 1.0; theta(stack.offA(0) + 1) = 2.0
    theta(stack.offG(0)) = 1.0; theta(stack.offG(0) + 1) = 1.0
    stack.enableBnRecording()
    val xs = Array(Array(1.0), Array(2.0), Array(3.0), Array(6.0))
    stack.forwardBatch(theta, xs, Array.fill(4)(0L))
    val rec = stack.takeRecorded()
    assert(rec.length == 1 && rec(0).length == 1)
    val s = rec(0)(0)
    // unit 0 sees z = (1,2,3,6): μ = 3, biased σ² = 3.5,
    // unbiased σ² = 3.5·4/3 = 14/3
    assert(math.abs(s.mu(0) - 3.0) < 1e-12, s.mu(0))
    assert(math.abs(s.varU(0) - 14.0 / 3.0) < 1e-9, s.varU(0))
    // unit 1 sees 2x: μ = 6, unbiased σ² = 4·14/3
    assert(math.abs(s.mu(1) - 6.0) < 1e-12, s.mu(1))
    assert(math.abs(s.varU(1) - 56.0 / 3.0) < 1e-9, s.varU(1))
    assert(s.m == 4)
    // drained: a second take returns nothing
    assert(stack.takeRecorded().isEmpty)
  }

  test("bnEma is available on all three MLP models (DeepHit / " +
    "LogisticHazardMlp fit and differ from their population twins)") {
    import spark.implicits._
    val rng = new Random(5)
    val rows = (0 until 300).map { i =>
      val x1 = 2 * rng.nextDouble() - 1
      (i.toLong, x1, rng.nextDouble(),
        1.0 + 10.0 * math.abs(x1) + rng.nextDouble(), rng.nextInt(2))
    }
    val d = SurvDataset.fromDataFrame(
      rows.toDF("idx", "x1", "x2", "time", "event"),
      Seq(col("idx")), "time", "event", features = Some(Seq("x1", "x2")))
    def differs(a: Seq[(Array[Array[Double]], Array[Double])],
                b: Seq[(Array[Array[Double]], Array[Double])]): Boolean =
      a.zip(b).exists { case ((a1, b1), (a2, b2)) =>
        a1.toSeq.flatMap(_.toSeq).zip(a2.toSeq.flatMap(_.toSeq))
          .exists { case (x, y) => math.abs(x - y) > 1e-9 } ||
          b1.zip(b2).exists { case (x, y) => math.abs(x - y) > 1e-9 }
      }
    val dhBase = DeepHit(numDurations = 5, epochs = 8, hidden = Seq(6),
      batchNorm = true)
    val dhPop = dhBase.fit(d)
    val dhEma = dhBase.copy(bnEma = true).fit(d)
    try assert(differs(dhPop.layers, dhEma.layers),
      "DeepHit bnEma produced identical layers to population stats")
    finally { dhPop.release(); dhEma.release() }
    val lhBase = LogisticHazardMlp(numDurations = 5, epochs = 8,
      hidden = Seq(6), batchNorm = true)
    val lhPop = lhBase.fit(d)
    val lhEma = lhBase.copy(bnEma = true).fit(d)
    try assert(differs(lhPop.layers, lhEma.layers),
      "LogisticHazardMlp bnEma produced identical layers to population stats")
    finally { lhPop.release(); lhEma.release() }
  }

  test("bnEma trains end-to-end, still learns, and yields different " +
    "prediction stats than the population default") {
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
    val base = CoxMlp(hidden = Seq(8), epochs = 40, lr = 0.05,
      batchNorm = true)
    val fPop = base.fit(d)
    val fEma = base.copy(bnEma = true).fit(d)
    try {
      // identical training trajectory (the EMA is prediction-time
      // only): same learned behavior bar the folded BN stats
      val cPop = fPop.score(d)("c_index")
      val cEma = fEma.score(d)("c_index")
      assert(cPop > 0.6, s"cPop=$cPop")
      assert(cEma > 0.6, s"cEma=$cEma")
      // the folded prediction layers must actually differ (EMA is a
      // momentum-weighted history, population is the exact final-θ
      // statistic — equality would mean the flag is dead)
      def flat(a: Array[Array[Double]]): Array[Double] =
        a.toSeq.flatMap(_.toSeq).toArray
      val diff = fPop.layers.zip(fEma.layers).exists { case ((a1, b1), (a2, b2)) =>
        flat(a1).zip(flat(a2)).exists { case (x, y) => math.abs(x - y) > 1e-9 } ||
          b1.zip(b2).exists { case (x, y) => math.abs(x - y) > 1e-9 }
      }
      assert(diff, "bnEma produced identical folded layers to population stats")
      // and the same seed reproduces the same EMA fit bit-for-bit
      val fEma2 = base.copy(bnEma = true).fit(d)
      try {
        val same = fEma.layers.zip(fEma2.layers).forall { case ((a1, b1), (a2, b2)) =>
          flat(a1).sameElements(flat(a2)) && b1.sameElements(b2)
        }
        assert(same, "bnEma fit is not reproducible under a fixed seed")
      } finally fEma2.release()
    } finally { fPop.release(); fEma.release() }
  }
}
