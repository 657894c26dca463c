package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier estimator — the censoring-survival estimate behind the
  * reference's `EvalSurv(..., censor_surv="km")` scoring
  * (reference: src/elastic_surv/models/base.py:75) and a first-class
  * operator here.
  *
  * Output per distinct time t: d (events at t), n (at risk = subjects
  * with T >= t), s = Π_{t' <= t} (1 - d/n).
  *
  * Scale shape: the row-level work is ONE shuffle (groupBy t with
  * map-side partial agg); the cumulative statistics over the grouped
  * distinct-time table then use the distributed three-pass range scan
  * (range-partition by t + per-partition summaries + driver carry +
  * seeded per-partition scan) instead of a single-partition ordered
  * window, so the curve survives continuous-time data where
  * |distinct t| ≈ n. The at-risk counts are integer sums (exact, any
  * association); the survival product's carry combines per-partition
  * partials, so the final ulps can differ from a single-sequence
  * windowed product — absorbed by the round(…, 6) every consumer
  * applies.
  */
object KaplanMeier {

  /** KM curve of the event distribution. */
  def curve(df: DataFrame, tCol: String, eCol: String): DataFrame =
    curveExpr(df, col(tCol), col(eCol))

  /** KM curve of the CENSORING distribution (event flag flipped) —
    * the IPCW weight source.
    */
  def censoringCurve(df: DataFrame, tCol: String, eCol: String): DataFrame =
    curveExpr(df, col(tCol), lit(1) - col(eCol))

  def curveExpr(df: DataFrame, t: Column, e: Column): DataFrame = {
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    // One shuffle to the grouped distinct-time table, range-ordered:
    // partition p holds strictly smaller t than p+1, rows sorted
    // within.
    val g = df.groupBy(t.cast("double").as("t"))
      .agg(sum(e.cast("long")).as("d"), count(lit(1)).as("m"))
      .repartitionByRange(np, col("t"))
      .sortWithinPartitions(col("t"))
      .select(col("t"), col("d"), col("m"))

    // RDD-level persist, shared BY OBJECT across the three passes: the
    // partitioning (RangePartitioner's sampled bounds) is computed once
    // for this one RDD, so the per-partition carries below can never
    // disagree with the emit pass. Registered with Pins so an enclosing
    // cache scope (Hyperband config evaluation, bench query) releases
    // it deterministically; outside a scope the ContextCleaner still
    // auto-unpersists once the returned DataFrame is unreachable.
    val rows = graft.core.Pins.pinRdd(g.rdd)

    // Pass 1: per-partition subject counts → suffix carries for n
    // (n_t = Σ_{t' >= t} m; integer sums — association-free).
    val mSums = rows.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single(pid -> it.map(_.getLong(2)).sum)
    }.collect().sortBy(_._1).map(_._2)
    // at-risk seed for partition p: Σ m over partitions >= p (the scan
    // then decrements row by row, so n at each row is the full
    // suffix count including that row's subjects)
    val mFrom = mSums.scanRight(0L)(_ + _).init

    // Pass 2: per-partition KM factor products (ascending-t,
    // left-to-right) → driver-side carry C_p = Π over partitions < p,
    // also combined left-to-right.
    val fProds = rows.mapPartitionsWithIndex { (pid, it) =>
      var atRisk = mFrom(pid)
      var prod = 1.0
      it.foreach { r =>
        val d = r.getLong(1); val m = r.getLong(2)
        prod = prod * (1.0 - d.toDouble / atRisk.toDouble)
        atRisk -= m
      }
      Iterator.single(pid -> prod)
    }.collect().sortBy(_._1).map(_._2)
    val carry = fProds.scanLeft(1.0)(_ * _).init

    // Pass 3: emit — re-run the identical factor sequence seeded with
    // the carry; the multiply order equals the global window's.
    val out = rows.mapPartitionsWithIndex { (pid, it) =>
      var atRisk = mFrom(pid)
      var s = carry(pid)
      it.map { r =>
        val tv = r.getDouble(0); val d = r.getLong(1); val m = r.getLong(2)
        val n = atRisk
        s = s * (1.0 - d.toDouble / n.toDouble)
        atRisk -= m
        org.apache.spark.sql.Row(tv, d, n, s)
      }
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("d", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.DoubleType))))
  }

  /** Step-function lookup value of `curve` at each `at` time:
    * s(max curve.t <= at), 1.0 before the first time. `curve` is
    * expected to be small (distinct times) and is broadcast.
    *
    * NOTE: the result is grouped by ALL columns of `points`, so rows
    * of `points` must be unique (e.g. carry a unique id) — fully
    * duplicate input rows would be collapsed into one output row.
    */
  def lookup(points: DataFrame, atCol: String, curve: DataFrame,
             strict: Boolean, out: String): DataFrame = {
    val c = broadcast(curve.select(col("t").as("_kt"), col("s").as("_ks")))
    val cond = if (strict) col("_kt") < col(atCol) else col("_kt") <= col(atCol)
    val joined = points.join(c, cond, "left")
    joined.groupBy(points.columns.map(col): _*)
      .agg(coalesce(max_by(col("_ks"), col("_kt")), lit(1.0)).as(out))
  }
}
