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
