package graft.eval

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Harrell C-index WITHOUT the quadratic pair join — the declared
  * 100-TB path (SURVEY §2.7, §7.5). Exactly equal to
  * [[Concordance.harrell]] (strict concordance, ties 0.5), but built
  * from counting structures instead of a pair space:
  *
  *   comparable  = Σ_t ev(t) · #{j : t_j > t}          (suffix sums)
  *   ties        = Σ_{r,t} ev(r,t) · #{j : r_j = r, t_j > t}
  *   concordant  = cross-bucket + within-bucket + 0.5·ties
  *
  * Risks are split into B coarse buckets by approxQuantile boundaries
  * (any monotone value→bucket map is CORRECT — bucketing only shapes
  * the partitioning, never the counts):
  *   - cross-bucket pairs (bucket_j < bucket_i ⇒ r_j < r_i) come from
  *     a (bucket × distinct-t) count grid with suffix sums over t and
  *     prefix sums over buckets — all window work over grouped rows;
  *   - within-bucket pairs are counted exactly per bucket with a
  *     local O(m log m) Fenwick sweep inside mapPartitions after a
  *     repartition on the bucket id (memory per task = bucket size,
  *     tunable via B).
  *
  * Ordered windows here run over DISTINCT times (same assumption as
  * KM/Breslow); for continuous-time data at extreme scale they would
  * switch to the StableOrder two-pass prefix-sum pattern.
  */
object ScalableConcordance {

  def harrell(df: DataFrame, tCol: String, eCol: String, riskCol: String,
              numBuckets: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val s = df.select(col(tCol).cast("double").as("t"),
      col(eCol).cast("int").as("e"), col(riskCol).cast("double").as("r"))

    // ---- comparable: events at t × subjects with larger t ----
    val wT = Window.orderBy(col("t"))
    val grpT = s.groupBy(col("t"))
      .agg(count(lit(1)).as("m"), sum(col("e")).as("ev"))
      .withColumn("after",
        coalesce(sum(col("m")).over(wT.rowsBetween(1, Window.unboundedFollowing)),
          lit(0L)))
    val comparable = grpT.agg(sum(col("ev") * col("after"))).head().getLong(0)

    // ---- ties: same risk, larger t ----
    val wRT = Window.partitionBy(col("r")).orderBy(col("t"))
    val ties = s.groupBy(col("r"), col("t"))
      .agg(count(lit(1)).as("m"), sum(col("e")).as("ev"))
      .withColumn("after",
        coalesce(sum(col("m")).over(wRT.rowsBetween(1, Window.unboundedFollowing)),
          lit(0L)))
      .agg(coalesce(sum(col("ev") * col("after")), lit(0L))).head().getLong(0)

    // ---- bucket assignment: monotone value→bucket map ----
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else s.stat.approxQuantile("r", probs, 0.001).distinct.sorted
    val bArr = array(bounds.map(lit(_)): _*)
    val bucketCol =
      if (bounds.isEmpty) lit(0) else size(filter(bArr, bd => bd < col("r")))
    val sb = s.withColumn("b", bucketCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- cross-bucket: (bucket × distinct t) grid ----
    val perBT = sb.groupBy(col("b"), col("t")).agg(count(lit(1)).as("m"))
    val allT = sb.select(col("t")).distinct()
    val allB = spark.range(0, bounds.length + 1L).select(col("id").cast("int").as("b"))
    val grid = allT.crossJoin(allB)
      .join(perBT, Seq("b", "t"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .withColumn("f", // # in bucket b with t_j > t
        coalesce(sum(col("m")).over(Window.partitionBy(col("b")).orderBy(col("t"))
          .rowsBetween(1, Window.unboundedFollowing)), lit(0L)))
      .withColumn("g", // Σ_{b' <= b} f(b', t)
        sum(col("f")).over(Window.partitionBy(col("t")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val evTB = sb.filter(col("e") === 1)
      .groupBy(col("t"), col("b")).agg(count(lit(1)).as("ev"))
    val cross = evTB
      .join(grid.select(col("t"), (col("b") + 1).as("b"), col("g")),
        Seq("t", "b"), "left")
      .agg(coalesce(sum(col("ev") * coalesce(col("g"), lit(0L))), lit(0L)))
      .head().getLong(0)

    // ---- within-bucket: exact local Fenwick sweep per bucket ----
    val within = sb.select(col("t"), col("e"), col("r"), col("b"))
      .repartition(col("b"))
      .as[(Double, Int, Double, Int)]
      .mapPartitions { it =>
        var total = 0L
        it.toSeq.groupBy(_._4).valuesIterator.foreach { rows =>
          total += countWithin(rows.map(x => (x._1, x._2, x._3)))
        }
        Iterator.single(total)
      }.reduce(_ + _)
    sb.unpersist()

    val concordant = cross + within + 0.5 * ties
    import spark.implicits._
    Seq((comparable, concordant, concordant / comparable.toDouble))
      .toDF("comparable", "concordant", "cindex")
  }

  /** Antolini time-dependent C-index WITHOUT the quadratic pair join —
    * same counting scheme as [[harrell]], with one extra leading key.
    *
    * Antolini compares S(t_i|x_i) vs S(t_i|x_j), so the compared score
    * depends on the pair only through τ(t_i) — the step grid point of
    * the event subject's time — and τ takes ≤ |grid| distinct values.
    * Slicing the long-form `surv` matrix (id, tau, s) by ACTIVE τ
    * (grid points hit by ≥1 event) gives, per slice, a plain Harrell
    * problem with risk r = −S(τ|x): comparable/ties/cross/within are
    * the identical suffix-sum + bucket-grid + Fenwick algebra with τ
    * prepended to every grouping key, window partition, and shuffle
    * key. Total work is O(|surv|) = O(n·|grid|) — the size of the
    * prediction matrix the caller already materialized — vs the
    * O(n_events·n) pair space of [[Concordance.antolini]].
    *
    * Buckets are equal-width on s ∈ [0, 1] (survival probabilities),
    * a monotone map, so the counts are exact regardless of balance;
    * B and spark.sql.shuffle.partitions bound per-task memory of the
    * within-bucket sweep.
    */
  def antolini(df: DataFrame, idCol: String, tCol: String, eCol: String,
               surv: DataFrame, grid: Array[Double],
               numBuckets: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // Step lookup τ(t): last grid point <= t (null below the grid) —
    // same literal-array expression as Concordance.antolini, so the
    // two agree on which events are scoreable.
    val gridArr = array(grid.map(lit(_)): _*)
    val eligible = filter(gridArr, g => g <= col("t"))
    val tauStep = when(size(eligible) > 0, element_at(eligible, -1))
    val base = df.select(col(idCol).as("k"), col(tCol).cast("double").as("t"),
        col(eCol).cast("int").as("e"))
      .withColumn("tau_i", tauStep)

    val activeTau = base.filter(col("e") === 1 && col("tau_i").isNotNull)
      .select(col("tau_i").as("tau")).distinct()

    // One Harrell slice per active τ: every subject once, as risk
    // r = −s(τ|x); the event flag is LOCAL to the subject's own slice.
    val x = surv.select(col(idCol).as("k"), col("tau"), col("s"))
      .join(broadcast(activeTau), Seq("tau"), "left_semi")
      .join(base, Seq("k"))
      .select(col("tau"), col("t"), negate(col("s").cast("double")).as("r"),
        when(col("e") === 1 && col("tau_i") === col("tau"), 1)
          .otherwise(0).as("ei"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val wTauT = Window.partitionBy(col("tau")).orderBy(col("t"))
    val comparable = x.groupBy(col("tau"), col("t"))
      .agg(count(lit(1)).as("m"), sum(col("ei")).as("ev"))
      .withColumn("after",
        coalesce(sum(col("m")).over(wTauT.rowsBetween(1, Window.unboundedFollowing)),
          lit(0L)))
      .agg(coalesce(sum(col("ev") * col("after")), lit(0L))).head().getLong(0)

    val wTauRT = Window.partitionBy(col("tau"), col("r")).orderBy(col("t"))
    val ties = x.groupBy(col("tau"), col("r"), col("t"))
      .agg(count(lit(1)).as("m"), sum(col("ei")).as("ev"))
      .withColumn("after",
        coalesce(sum(col("m")).over(wTauRT.rowsBetween(1, Window.unboundedFollowing)),
          lit(0L)))
      .agg(coalesce(sum(col("ev") * col("after")), lit(0L))).head().getLong(0)

    // b monotone in r: r = −s ∈ [−1, 0] → equal-width cells, clamped.
    val b = greatest(lit(0), least(lit(numBuckets - 1),
      floor((col("r") + 1.0) * numBuckets).cast("int")))
    val xb = x.withColumn("b", b)

    val perBT = xb.groupBy(col("tau"), col("b"), col("t")).agg(count(lit(1)).as("m"))
    val allTauT = x.select(col("tau"), col("t")).distinct()
    val allB = spark.range(0, numBuckets.toLong).select(col("id").cast("int").as("b"))
    val cells = allTauT.crossJoin(allB)
      .join(perBT, Seq("tau", "b", "t"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .withColumn("f", // # in (τ, b) with t_j > t
        coalesce(sum(col("m")).over(Window.partitionBy(col("tau"), col("b"))
          .orderBy(col("t")).rowsBetween(1, Window.unboundedFollowing)), lit(0L)))
      .withColumn("g", // Σ_{b' <= b} f(τ, b', t)
        sum(col("f")).over(Window.partitionBy(col("tau"), col("t")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val evTB = xb.filter(col("ei") === 1)
      .groupBy(col("tau"), col("t"), col("b")).agg(count(lit(1)).as("ev"))
    val cross = evTB
      .join(cells.select(col("tau"), col("t"), (col("b") + 1).as("b"), col("g")),
        Seq("tau", "t", "b"), "left")
      .agg(coalesce(sum(col("ev") * coalesce(col("g"), lit(0L))), lit(0L)))
      .head().getLong(0)

    val within = xb.select(col("tau"), col("b"), col("t"), col("ei"), col("r"))
      .repartition(col("tau"), col("b"))
      .as[(Double, Int, Double, Int, Double)]
      .mapPartitions { it =>
        var total = 0L
        it.toSeq.groupBy(p => (p._1, p._2)).valuesIterator.foreach { rows =>
          total += countWithin(rows.map(p => (p._3, p._4, p._5)))
        }
        Iterator.single(total)
      }.reduce(_ + _)
    x.unpersist()

    val concordant = cross + within + 0.5 * ties
    Seq((comparable, concordant, concordant / comparable.toDouble))
      .toDF("comparable", "concordant", "cindex")
  }

  /** Strict pairs {(i,j): e_i=1, t_j > t_i, r_j < r_i} in one bucket:
    * descending-time sweep with a Fenwick tree over local risk ranks
    * (equal-t groups query before inserting → strict t).
    */
  private[eval] def countWithin(rows: Seq[(Double, Int, Double)]): Long = {
    if (rows.size < 2) return 0L
    val ranks = rows.map(_._3).distinct.sorted.zipWithIndex.toMap
    val bit = new Fenwick(ranks.size)
    var total = 0L
    rows.groupBy(_._1).toSeq.sortBy(-_._1).foreach { case (_, grp) =>
      grp.foreach { case (_, e, r) =>
        if (e == 1) total += bit.queryBelow(ranks(r)) // inserted have t_j > t_i
      }
      grp.foreach { case (_, _, r) => bit.add(ranks(r)) }
    }
    total
  }

  private[eval] final class Fenwick(n: Int) {
    private val a = new Array[Long](n + 1)
    def add(i0: Int): Unit = {
      var i = i0 + 1
      while (i <= n) { a(i) += 1; i += i & (-i) }
    }
    /** # inserted with rank < i0 (strictly). */
    def queryBelow(i0: Int): Long = {
      var i = i0 // prefix sum of ranks [0, i0-1] = indices [1, i0]
      var s = 0L
      while (i > 0) { s += a(i); i -= i & (-i) }
      s
    }
  }
}
