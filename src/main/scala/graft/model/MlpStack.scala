package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, greatest, lit}

/** Shared ReLU MLP stack algebra for the per-partition training
  * accumulators (DeepHit, CoxMlp, LogisticHazard's MLP flavor) — the
  * `tt.practical.MLPVanilla` hidden stack (reference:
  * model_cox_ph.py:50-57, model_deephit.py:57-64; batch-norm/dropout
  * are the engine-wide documented deviation). Plain-array exact
  * forward/backward; the caller owns θ and supplies the offset where
  * the stack's parameters start.
  *
  * θ slice layout from `off`: per layer l (input width in_l):
  * A_l (h_l×in_l row-major), b_l (h_l).
  */
final class MlpStack(p: Int, hidden: Seq[Int], off: Int) {
  val widths: Array[Int] = hidden.toArray
  val nL: Int = widths.length
  val ins: Array[Int] =
    if (nL == 0) Array.empty else (p +: hidden.init).toArray
  /** Output width of the stack (p when there are no hidden layers). */
  val outWidth: Int = if (nL > 0) widths(nL - 1) else p
  /** Per-layer offsets of A_l and b_l inside θ. */
  val (offA, offB) = {
    val oa = new Array[Int](nL); val ob = new Array[Int](nL)
    var o = off
    var l = 0
    while (l < nL) {
      oa(l) = o; ob(l) = o + widths(l) * ins(l)
      o = ob(l) + widths(l); l += 1
    }
    (oa, ob)
  }
  /** Total parameter count of the stack. */
  val size: Int =
    widths.indices.map(l => widths(l) * ins(l) + widths(l)).sum

  /** Forward: acts(0) = x, acts(l+1) = relu(A_l·acts(l) + b_l). The
    * returned activations array is what [[backward]] consumes.
    */
  def forward(theta: Array[Double], x: Array[Double]): Array[Array[Double]] = {
    val acts = new Array[Array[Double]](nL + 1)
    acts(0) = x
    var l = 0
    while (l < nL) {
      val in = acts(l)
      val out = new Array[Double](widths(l))
      var j = 0
      while (j < widths(l)) {
        var s = theta(offB(l) + j)
        var m = 0
        while (m < ins(l)) { s += theta(offA(l) + j * ins(l) + m) * in(m); m += 1 }
        if (s > 0.0) out(j) = s // relu; zeros stay zero
        j += 1
      }
      acts(l + 1) = out
      l += 1
    }
    acts
  }

  /** Backward from dTop = ∂L/∂acts(nL): accumulates grad(A_l, b_l)
    * into `grad` layer by layer through the relu stack. No-op when
    * the stack is empty.
    */
  def backward(theta: Array[Double], grad: Array[Double],
               acts: Array[Array[Double]], dTop: Array[Double]): Unit = {
    var dh = dTop
    var l = nL - 1
    while (l >= 0) {
      val out = acts(l + 1)
      val in = acts(l)
      val dIn = if (l > 0) new Array[Double](ins(l)) else null
      var j = 0
      while (j < widths(l)) {
        // relu'(pre) = 1{pre > 0} ⟺ out(j) > 0 (exact zeros inactive)
        if (out(j) > 0.0 && dh(j) != 0.0) {
          grad(offB(l) + j) += dh(j)
          var m = 0
          while (m < ins(l)) {
            grad(offA(l) + j * ins(l) + m) += dh(j) * in(m)
            if (l > 0) dIn(m) += dh(j) * theta(offA(l) + j * ins(l) + m)
            m += 1
          }
        }
        j += 1
      }
      dh = dIn
      l -= 1
    }
  }

  /** Extract the (A_l, b_l) layer weights from a trained θ — the
    * shape the fitted models' column-algebra forward passes consume.
    */
  def extract(theta: Array[Double]): Seq[(Array[Array[Double]], Array[Double])] =
    widths.indices.map { l =>
      (Array.tabulate(widths(l), ins(l))((j, m) =>
        theta(offA(l) + j * ins(l) + m)),
        Array.tabulate(widths(l))(j => theta(offB(l) + j)))
    }

  /** Seeded U(±1/√fan_in) init of the stack's θ slice (torch Linear
    * default), using the supplied rng so the caller controls the
    * draw order of the full parameter vector.
    */
  def init(theta: Array[Double], rng: scala.util.Random): Unit = {
    var l = 0
    var i = if (nL > 0) offA(0) else off
    while (l < nL) {
      val lim = 1.0 / math.sqrt(ins(l).toDouble)
      val end = offA(l) + widths(l) * ins(l) + widths(l)
      while (i < end) { theta(i) = (2 * rng.nextDouble() - 1) * lim; i += 1 }
      l += 1
    }
  }
}

object MlpStack {

  /** f(x) through the ReLU stack as pure let-bound column algebra —
    * the ONE shared prediction-path forward for every fitted model
    * (FittedDeepHit / FittedCoxMlp / FittedLogisticHazardMlp). Each
    * layer's input is bound once per row; naively folded, every
    * element of layer l+1 would re-embed (and re-evaluate) the whole
    * layer-l expression.
    */
  def stackCol(x: Column,
               layers: Seq[(Array[Array[Double]], Array[Double])]): Column =
    layers.foldLeft(x) { case (acc, (a, b)) =>
      graft.functions.Let.bind(acc) { f =>
        array(a.indices.map(j =>
          greatest(lit(0.0), lit(b(j)) + CoxPH.scoreCol(f, a(j)))): _*)
      }
    }
}
