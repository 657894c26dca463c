package graft.model

/** Driver-side Adam with early stopping over an exact full-pass
  * loss/gradient oracle — the shared training loop of the three
  * per-partition-accumulator models (DeepHit, CoxMlp,
  * LogisticHazardMlp). `lossGrad(θ)` runs one distributed pass and
  * returns the NORMALIZED (per-row or per-event) loss and gradient;
  * the loop returns the best EVALUATED iterate (the θ whose loss was
  * actually measured, never the post-step parameters).
  *
  * Fault tolerance: the full optimizer state is a few KB of driver
  * doubles, so [[runFrom]] exposes it as a [[AdamLoop.Checkpoint]]
  * after every evaluated epoch (`onEpoch`) and resumes from one
  * bit-exactly — a preempted 100-TB fit restarts at its last epoch
  * instead of epoch 0 ([[save]]/[[load]] round-trip one through a
  * local file). Resuming reproduces the uninterrupted run exactly
  * when `lossGrad` is a pure function of θ; trainers whose loss
  * depends on the epoch index (the dropout mask key) must re-seat
  * their own counter from `Checkpoint.epoch`.
  */
private[model] object AdamLoop {

  /** Complete optimizer state after `epoch` evaluated iterates. */
  final case class Checkpoint(epoch: Int, step: Int,
                              theta: Array[Double],
                              m: Array[Double], v: Array[Double],
                              best: Double, bestTheta: Array[Double],
                              badEpochs: Int)

  def run(theta0: Array[Double], epochs: Int, patience: Int, lr: Double)
         (lossGrad: Array[Double] => (Double, Array[Double])): Array[Double] =
    runFrom(None, theta0, epochs, patience, lr)(lossGrad)

  def runFrom(resume: Option[Checkpoint],
              theta0: Array[Double], epochs: Int, patience: Int, lr: Double,
              onEpoch: Checkpoint => Unit = _ => ())
             (lossGrad: Array[Double] => (Double, Array[Double])): Array[Double] = {
    var theta = resume.map(_.theta.clone()).getOrElse(theta0)
    val mAdam = resume.map(_.m.clone()).getOrElse(Array.fill(theta.length)(0.0))
    val vAdam = resume.map(_.v.clone()).getOrElse(Array.fill(theta.length)(0.0))
    var best = resume.map(_.best).getOrElse(Double.MaxValue)
    var bestTheta = resume.map(_.bestTheta.clone()).getOrElse(theta.clone())
    var badEpochs = resume.map(_.badEpochs).getOrElse(0)
    val (b1, b2, eps) = (0.9, 0.999, 1e-8)
    var step = resume.map(_.step).getOrElse(0)
    var epoch = resume.map(_.epoch).getOrElse(0)
    while (epoch < epochs && badEpochs < patience) {
      val th = theta
      val (loss, grad) = lossGrad(th)
      step += 1
      val newTheta = theta.clone()
      // bias corrections are i-invariant — hoisted (2 pow calls per
      // epoch instead of 2|theta|)
      val c1 = 1 - math.pow(b1, step)
      val c2 = 1 - math.pow(b2, step)
      var i = 0
      while (i < theta.length) {
        val g = grad(i)
        mAdam(i) = b1 * mAdam(i) + (1 - b1) * g
        vAdam(i) = b2 * vAdam(i) + (1 - b2) * g * g
        val mh = mAdam(i) / c1
        val vh = vAdam(i) / c2
        newTheta(i) = theta(i) - lr * mh / (math.sqrt(vh) + eps)
        i += 1
      }
      theta = newTheta
      // snapshot the EVALUATED iterate (th), not the post-step theta
      if (loss < best - 1e-6) { best = loss; bestTheta = th.clone(); badEpochs = 0 }
      else badEpochs += 1
      epoch += 1
      onEpoch(Checkpoint(epoch, step, theta.clone(), mAdam.clone(),
        vAdam.clone(), best, bestTheta.clone(), badEpochs))
    }
    bestTheta
  }

  /** Write a checkpoint to a local file (driver-side, a few KB).
    * Write-to-temp + atomic rename: a crash or preemption mid-write —
    * the exact failure checkpointing exists for — must never truncate
    * the only good checkpoint.
    */
  def save(cp: Checkpoint, path: String): Unit = {
    val target = java.nio.file.Paths.get(path).toAbsolutePath
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(tmp.toFile)))
    try {
      out.writeInt(cp.epoch); out.writeInt(cp.step)
      out.writeDouble(cp.best); out.writeInt(cp.badEpochs)
      out.writeInt(cp.theta.length)
      Seq(cp.theta, cp.m, cp.v, cp.bestTheta)
        .foreach(_.foreach(out.writeDouble))
    } finally out.close()
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def load(path: String): Checkpoint = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      val epoch = in.readInt(); val step = in.readInt()
      val best = in.readDouble(); val badEpochs = in.readInt()
      val len = in.readInt()
      def arr() = Array.fill(len)(in.readDouble())
      Checkpoint(epoch, step, arr(), arr(), arr(), best, arr(), badEpochs)
    } finally in.close()
  }
}
