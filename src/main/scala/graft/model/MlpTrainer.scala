package graft.model

import org.apache.spark.sql.Dataset

/** The distributed training rhythm shared by the three MLP models
  * ([[CoxMlp]], [[LogisticHazardMlp]], [[DeepHit]]): deterministic
  * rn-contiguous batches inside each partition, an exact per-batch
  * loss+gradient in a plain-array accumulator, ONE (loss, grad, norm)
  * reduce per epoch (|θ|+2 doubles over the wire), [[AdamLoop]] on
  * the driver, then the eval-mode BN population-stats calibration
  * against the still-cached train rows. Extracted so the next
  * behavior-drift bug cannot land in one trainer's copy of the loop
  * and miss the other two.
  */
private[model] object MlpTrainer {

  /** Per-partition exact loss+gradient accumulator contract. `norm`
    * is the model's loss normalizer contribution — row count for the
    * per-row losses (DeepHit NLL, logistic-hazard BCE), EVENT count
    * for the Cox partial likelihood.
    */
  trait BatchAccumulator[R] {
    def addBatch(batch: Array[R]): Unit
    def loss: Double
    def grad: Array[Double]
    def norm: Long
  }

  /** θ init for the shared [zero head (zeroLen), W (wLen), stack]
    * layout: zero head (correct for intercept-like segments), the W
    * segment ~ U(±1/√outWidth) (torch Linear default), [[MlpStack
    * .init]] for the stack — all from one seeded RNG so fits
    * reproduce. A pure linear head (`stack.nL == 0`) inits W only
    * when `initLinearHead` (the neural-Cox output weights need
    * symmetry breaking even without hidden layers; the discrete
    * models' zero init is correct for a linear head).
    */
  def initTheta(zeroLen: Int, wLen: Int, stack: MlpStack, seed: Long,
                initLinearHead: Boolean): Array[Double] = {
    val t = Array.fill(zeroLen + wLen + stack.size)(0.0)
    if (initLinearHead || stack.nL > 0) {
      val rng = new scala.util.Random(seed)
      val limW = 1.0 / math.sqrt(stack.outWidth.toDouble)
      var i = zeroLen
      while (i < zeroLen + wLen) {
        t(i) = (2 * rng.nextDouble() - 1) * limW; i += 1
      }
      stack.init(t, rng)
    }
    t
  }

  /** Run the shared epoch loop; returns (bestTheta, eval-mode BN
    * population stats). `mkAcc(θ, dropKey0)` builds the model's
    * accumulator for one partition of one epoch — its captures must
    * be serializable primitives, never the model instance. Dropout
    * masks re-draw every evaluated iterate (dropKey0 mixes the seed
    * with the epoch counter), like torch's per-forward Bernoulli
    * draw. Callers release the cached train rows AFTER this returns —
    * the BN calibration scans them.
    */
  def fit[R](train: Dataset[R])
            (feat: R => Array[Double],
             stack: MlpStack, theta0: Array[Double],
             batchSize: Int, epochs: Int, patience: Int, lr: Double,
             seed: Long, batchNorm: Boolean)
            (mkAcc: (Array[Double], Long) => BatchAccumulator[R])
            (implicit ct: scala.reflect.ClassTag[R])
      : (Array[Double], Option[Array[(Array[Double], Array[Double])]]) = {
    val bs = batchSize
    // RDD of the persisted Dataset: the generic R has no Encoder for a
    // Dataset.mapPartitions round-trip; the scan still serves from the
    // caller's cache and the reduce ships |θ|+2 doubles per partition
    val rows = train.rdd
    var iterNo = 0L // driver-side: the closure sees a fresh key per epoch
    val bestTheta = AdamLoop.run(theta0, epochs, patience, lr) { th =>
      iterNo += 1
      val dropKey0 = MlpStack.mixKey(seed, iterNo)
      val (lossSum, grad, cnt) = rows.mapPartitions { it =>
        val acc = mkAcc(th, dropKey0)
        it.grouped(bs).foreach(batch => acc.addBatch(batch.toArray))
        Iterator.single((acc.loss, acc.grad, acc.norm))
      }.reduce { (a, b) =>
        val g = a._2.clone()
        var i = 0; while (i < g.length) { g(i) += b._2(i); i += 1 }
        (a._1 + b._1, g, a._3 + b._3)
      }
      val d = math.max(cnt, 1L).toDouble
      (lossSum / d, grad.map(_ / d))
    }
    // eval-mode BN calibration (torch running-stats replacement)
    val bnStats =
      if (batchNorm && stack.nL > 0)
        Some(MlpStack.populationStats(train.rdd.map(feat), stack, bestTheta))
      else None
    (bestTheta, bnStats)
  }
}
