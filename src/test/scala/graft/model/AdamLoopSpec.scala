package graft.model

import org.scalatest.funsuite.AnyFunSuite

class AdamLoopSpec extends AnyFunSuite {

  // pure quadratic oracle: loss = Σ (θ_i − c_i)², grad = 2(θ − c)
  private def quad(c: Array[Double])(th: Array[Double]): (Double, Array[Double]) = {
    val loss = th.indices.map(i => (th(i) - c(i)) * (th(i) - c(i))).sum
    (loss, th.indices.map(i => 2.0 * (th(i) - c(i))).toArray)
  }

  test("resume from a mid-run checkpoint reproduces the full run exactly") {
    val c = Array(0.3, -1.2, 2.5)
    val t0 = Array(0.0, 0.0, 0.0)
    val full = AdamLoop.run(t0.clone(), 20, 50, 0.1)(quad(c))

    // run 5 epochs, capture the optimizer state, round-trip it
    // through a file, resume to 20 — must be bit-identical
    var cp5: Option[AdamLoop.Checkpoint] = None
    AdamLoop.runFrom(None, t0.clone(), 5, 50, 0.1,
      cp => if (cp.epoch == 5) cp5 = Some(cp))(quad(c))
    assert(cp5.nonEmpty)
    val f = java.io.File.createTempFile("adamloop", ".cp")
    f.deleteOnExit()
    AdamLoop.save(cp5.get, f.getPath)
    val loaded = AdamLoop.load(f.getPath)
    assert(loaded.epoch == 5 && loaded.step == 5)
    assert(loaded.theta.sameElements(cp5.get.theta))
    assert(loaded.m.sameElements(cp5.get.m))
    assert(loaded.v.sameElements(cp5.get.v))
    val resumed = AdamLoop.runFrom(Some(loaded), t0.clone(), 20, 50, 0.1)(quad(c))
    assert(resumed.sameElements(full),
      s"${resumed.toSeq} vs ${full.toSeq}")
  }

  test("early-stopping state survives the checkpoint") {
    // constant loss: every epoch after the first is "bad"; patience 3
    // stops the full run after 4 evals. Resuming from epoch 2 (with
    // badEpochs = 1 in state) must stop after 2 MORE evals, not 4.
    var evals = 0
    def flat(th: Array[Double]): (Double, Array[Double]) = {
      evals += 1
      (1.0, Array.fill(th.length)(0.0))
    }
    var cp2: Option[AdamLoop.Checkpoint] = None
    AdamLoop.runFrom(None, Array(0.0), 2, 3, 0.1,
      cp => if (cp.epoch == 2) cp2 = Some(cp))(flat)
    assert(cp2.get.badEpochs == 1)
    evals = 0
    AdamLoop.runFrom(cp2, Array(0.0), 100, 3, 0.1)(flat)
    assert(evals == 2, s"expected 2 more evals, got $evals")
  }
}
