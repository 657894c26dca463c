package graft.model

/** Driver-side Adam with early stopping over an exact full-pass
  * loss/gradient oracle — the shared training loop of the three
  * per-partition-accumulator models (DeepHit, CoxMlp,
  * LogisticHazardMlp). `lossGrad(θ)` runs one distributed pass and
  * returns the NORMALIZED (per-row or per-event) loss and gradient;
  * the loop returns the best EVALUATED iterate (the θ whose loss was
  * actually measured, never the post-step parameters).
  */
private[model] object AdamLoop {

  def run(theta0: Array[Double], epochs: Int, patience: Int, lr: Double)
         (lossGrad: Array[Double] => (Double, Array[Double])): Array[Double] = {
    var theta = theta0
    val mAdam = Array.fill(theta.length)(0.0)
    val vAdam = Array.fill(theta.length)(0.0)
    var best = Double.MaxValue
    var bestTheta = theta.clone()
    var badEpochs = 0
    val (b1, b2, eps) = (0.9, 0.999, 1e-8)
    var step = 0
    var epoch = 0
    while (epoch < epochs && badEpochs < patience) {
      val th = theta
      val (loss, grad) = lossGrad(th)
      step += 1
      val newTheta = theta.clone()
      var i = 0
      while (i < theta.length) {
        val g = grad(i)
        mAdam(i) = b1 * mAdam(i) + (1 - b1) * g
        vAdam(i) = b2 * vAdam(i) + (1 - b2) * g * g
        val mh = mAdam(i) / (1 - math.pow(b1, step))
        val vh = vAdam(i) / (1 - math.pow(b2, step))
        newTheta(i) = theta(i) - lr * mh / (math.sqrt(vh) + eps)
        i += 1
      }
      theta = newTheta
      // snapshot the EVALUATED iterate (th), not the post-step theta
      if (loss < best - 1e-6) { best = loss; bestTheta = th.clone(); badEpochs = 0 }
      else badEpochs += 1
      epoch += 1
    }
    bestTheta
  }
}
