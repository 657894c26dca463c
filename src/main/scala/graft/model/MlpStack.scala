package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, greatest, lit}

/** Shared ReLU MLP stack algebra for the per-partition training
  * accumulators (DeepHit, CoxMlp, LogisticHazard's MLP flavor) — the
  * `tt.practical.MLPVanilla` hidden stack (reference:
  * model_cox_ph.py:50-57, model_deephit.py:57-64).
  *
  * `bn = true` adds the AFFINE-ONLY (frozen-stats) batch-norm flavor:
  * each block becomes Linear → γ⊙z+β → ReLU, i.e. torch's
  * `BatchNorm1d` in eval mode with the running stats absorbed into
  * (γ, β). The reference's nets train BN with BATCH statistics — the
  * engine trades that for exact deterministic batch gradients (the
  * engine-wide documented deviation, SURVEY §4.3); this flavor makes
  * the reference's default net SHAPE representable and `batch_norm`
  * searchable while keeping gradients exact. Mathematically the
  * per-unit affine is absorbable into the linear layer — what it
  * changes is the parameterization the optimizer walks, which is
  * exactly what the reference's `batch_norm` hyperparameter toggles.
  *
  * `dropout > 0` adds DETERMINISTIC inverted dropout after each
  * block's ReLU (torch MLPVanilla order: Linear → BN → ReLU →
  * Dropout, the reference's `dropout` hyperparameter,
  * model_cox_ph.py:21,74). Each unit's keep/drop decision is a pure
  * hash of (dropKey, layer, unit) — the caller derives dropKey from
  * (model seed, iteration, row id) via [[MlpStack.mixKey]], so masks
  * are reproducible, partitioning-independent, and re-drawn every
  * iteration like torch's per-forward Bernoulli draw. Kept units
  * scale by 1/(1−q) (inverted dropout), so the inference path
  * ([[extract]]/[[MlpStack.stackCol]], which never masks) needs no
  * rescaling. Masks don't depend on θ, so gradients through the
  * masked net stay exact (finite-diff-checkable at fixed dropKey).
  *
  * θ slice layout from `off`: per layer l (input width in_l):
  * A_l (h_l×in_l row-major), b_l (h_l), then with bn: γ_l (h_l),
  * β_l (h_l).
  */
final class MlpStack(p: Int, hidden: Seq[Int], off: Int,
                     bn: Boolean = false, dropout: Double = 0.0) {
  require(dropout >= 0.0 && dropout < 1.0, s"dropout=$dropout not in [0,1)")
  /** Inverted-dropout keep scale; 1.0 when dropout is off, so the
    * backward pass can multiply unconditionally.
    */
  private val dropScale: Double = if (dropout > 0.0) 1.0 / (1.0 - dropout) else 1.0
  val widths: Array[Int] = hidden.toArray
  val nL: Int = widths.length
  val ins: Array[Int] =
    if (nL == 0) Array.empty else (p +: hidden.init).toArray
  /** Output width of the stack (p when there are no hidden layers). */
  val outWidth: Int = if (nL > 0) widths(nL - 1) else p
  /** Per-layer offsets of A_l, b_l (and γ_l, β_l with bn) inside θ. */
  val (offA, offB, offG, offBt) = {
    val oa = new Array[Int](nL); val ob = new Array[Int](nL)
    val og = new Array[Int](nL); val obt = new Array[Int](nL)
    var o = off
    var l = 0
    while (l < nL) {
      oa(l) = o; ob(l) = o + widths(l) * ins(l)
      o = ob(l) + widths(l)
      if (bn) { og(l) = o; obt(l) = o + widths(l); o = obt(l) + widths(l) }
      l += 1
    }
    (oa, ob, og, obt)
  }
  /** Total parameter count of the stack. */
  val size: Int = widths.indices.map(l =>
    widths(l) * ins(l) + widths(l) + (if (bn) 2 * widths(l) else 0)).sum

  /** Forward: acts(0) = x, acts(l+1) = drop(relu(bn_l(A_l·acts(l) +
    * b_l))). The returned activations array is what [[backward]]
    * consumes. With bn, acts(l+1) has length 2·h_l: [post-relu out |
    * pre-BN preactivation z] — consumers of the stack OUTPUT read only
    * the first [[outWidth]] entries, backward needs z for ∂γ.
    *
    * `dropKey` seeds the dropout masks (ignored when dropout == 0);
    * kept active units carry y/(1−q), dropped ones are exactly 0 — so
    * acts(l+1)(j) > 0 ⟺ "relu-active AND kept", the one predicate
    * [[backward]] gates on.
    */
  def forward(theta: Array[Double], x: Array[Double],
              dropKey: Long = 0L): Array[Array[Double]] = {
    val acts = new Array[Array[Double]](nL + 1)
    acts(0) = x
    var l = 0
    while (l < nL) {
      val in = acts(l)
      val w = widths(l)
      val out = new Array[Double](if (bn) 2 * w else w)
      var j = 0
      while (j < w) {
        var s = theta(offB(l) + j)
        var m = 0
        while (m < ins(l)) { s += theta(offA(l) + j * ins(l) + m) * in(m); m += 1 }
        var y = s
        if (bn) {
          out(w + j) = s
          y = theta(offG(l) + j) * s + theta(offBt(l) + j)
        }
        if (y > 0.0 &&
            (dropout == 0.0 || MlpStack.u01(dropKey, l, j) >= dropout))
          out(j) = y * dropScale // relu (+ inverted-dropout keep scale)
        j += 1
      }
      acts(l + 1) = out
      l += 1
    }
    acts
  }

  /** Backward from dTop = ∂L/∂acts(nL): accumulates grad(A_l, b_l, and
    * with bn γ_l, β_l) into `grad` layer by layer through the relu
    * stack. No-op when the stack is empty.
    */
  def backward(theta: Array[Double], grad: Array[Double],
               acts: Array[Array[Double]], dTop: Array[Double]): Unit = {
    var dh = dTop
    var l = nL - 1
    while (l >= 0) {
      val out = acts(l + 1)
      val in = acts(l)
      val w = widths(l)
      val dIn = if (l > 0) new Array[Double](ins(l)) else null
      var j = 0
      while (j < w) {
        // relu'(y) = 1{y > 0} ⟺ out(j) > 0 (exact zeros inactive;
        // dropped units are exactly 0, so the same gate skips them)
        if (out(j) > 0.0 && dh(j) != 0.0) {
          // o = y·scale for kept units ⇒ dL/dy = dh·scale (scale = 1
          // when dropout is off)
          var d = dh(j) * dropScale
          if (bn) {
            grad(offG(l) + j) += d * out(w + j) // ∂γ = d·z
            grad(offBt(l) + j) += d // ∂β = d
            d = d * theta(offG(l) + j) // ∂z = d·γ
          }
          grad(offB(l) + j) += d
          var m = 0
          while (m < ins(l)) {
            grad(offA(l) + j * ins(l) + m) += d * in(m)
            if (l > 0) dIn(m) += d * theta(offA(l) + j * ins(l) + m)
            m += 1
          }
        }
        j += 1
      }
      dh = dIn
      l -= 1
    }
  }

  /** Extract the (A_l, b_l) layer weights from a trained θ — the shape
    * the fitted models' column-algebra forward passes consume. The bn
    * affine folds in exactly (A' = γ⊙A rows, b' = γ⊙b + β): the
    * prediction path ([[MlpStack.stackCol]]) stays bn-agnostic and
    * bit-equal to the training forward.
    */
  def extract(theta: Array[Double]): Seq[(Array[Array[Double]], Array[Double])] =
    widths.indices.map { l =>
      def g(j: Int): Double = if (bn) theta(offG(l) + j) else 1.0
      def bt(j: Int): Double = if (bn) theta(offBt(l) + j) else 0.0
      (Array.tabulate(widths(l), ins(l))((j, m) =>
        g(j) * theta(offA(l) + j * ins(l) + m)),
        Array.tabulate(widths(l))(j => g(j) * theta(offB(l) + j) + bt(j)))
    }

  /** Seeded U(±1/√fan_in) init of the stack's θ slice (torch Linear
    * default; BN affine starts at identity γ=1, β=0 like torch), using
    * the supplied rng so the caller controls the draw order of the
    * full parameter vector.
    */
  def init(theta: Array[Double], rng: scala.util.Random): Unit = {
    var l = 0
    while (l < nL) {
      val lim = 1.0 / math.sqrt(ins(l).toDouble)
      var i = offA(l)
      val end = offB(l) + widths(l)
      while (i < end) { theta(i) = (2 * rng.nextDouble() - 1) * lim; i += 1 }
      if (bn) {
        var j = 0
        while (j < widths(l)) {
          theta(offG(l) + j) = 1.0
          theta(offBt(l) + j) = 0.0
          j += 1
        }
      }
      l += 1
    }
  }
}

object MlpStack {

  /** splitmix64 finalizer — the mask/key hash core. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Derive a dropout key from two components (chain for more:
    * mixKey(mixKey(seed, iter), rowId)). Order-sensitive, so
    * (iter, row) and (row, iter) draw independent masks.
    */
  def mixKey(a: Long, b: Long): Long = mix64(a ^ (b * 0xC2B2AE3D27D4EB4FL))

  /** U[0,1) keep-draw for (dropKey, layer, unit) — pure, θ-free. */
  private[model] def u01(dropKey: Long, l: Int, j: Int): Double =
    (mix64(dropKey ^ (l.toLong << 32) ^ j.toLong) >>> 11) * 1.1102230246251565e-16

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
