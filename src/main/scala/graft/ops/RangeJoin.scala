package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interval (range) join: all pairs (l, r) with equal key
  * and `r.time` in `[l.time - window, l.time]` — the batch flavor of
  * click-attribution / feature-lookback joins. (The as-of join keeps
  * only the latest matching right row; this keeps them all.)
  *
  * The naive formulation is an equi-join on the key with a range
  * predicate — per-key quadratic, a skew bomb on any hot key. This is
  * the standard bin-bucketed shape instead: times are bucketed at
  * `window` granularity, so a right row in bucket b can only match
  * left rows in buckets {b, b+1}. The right side is replicated exactly
  * 2x and the join becomes an equi-join on (key, bucket); the exact
  * range predicate then closes the bucket approximation. Candidate
  * count is bounded by per-(key, bucket) co-residency — at 100 TB the
  * shuffle is keyed on content and a hot key spreads over its time
  * buckets instead of landing on one reducer. Times must be
  * non-negative integers (epoch micros here; `div` floors toward zero).
  */
object RangeJoin {

  /** Inner interval join; output = all left columns + `r_`-prefixed
    * right payload columns. Left rows without a match are absent
    * (aggregate + left-join back for left semantics).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String, window: Long,
                   rightPayload: Seq[String]): DataFrame = {
    require(window > 0, "window must be positive")
    require(!rightPayload.contains(rightTime),
      s"right time column $rightTime is emitted as r_$rightTime already")
    val lCols = left.columns.toSeq
    val l = left.withColumn("_lb", expr(s"$leftTime div $window"))
    // a right row in bucket rb matches left buckets rb and rb+1
    val r = right.select(
        (col(key).as("_rk") +: col(rightTime).as("_rt") +:
          rightPayload.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("_rb", explode(array(expr(s"_rt div $window"),
        expr(s"_rt div $window") + lit(1L))))
    l.join(r, col(key) === col("_rk") && col("_lb") === col("_rb") &&
        col("_rt") >= col(leftTime) - lit(window) &&
        col("_rt") <= col(leftTime))
      .select(lCols.map(col) ++
        Seq(col("_rt").as(s"r_$rightTime")) ++
        rightPayload.map(c => col(s"r_$c")): _*)
  }

  /** Interval-OVERLAP equi-join: all pairs (l, r) with equal key whose
    * closed intervals [lStart, lEnd] × [rStart, rEnd] intersect
    * (touching endpoints count). Same bin-bucketing discipline as
    * [[intervalJoin]], generalized to interval × interval: each side
    * replicates to the `binWidth`-granularity bins its interval
    * covers, the join is an equi-join on (key, bin), the exact overlap
    * predicate closes the approximation, and the duplicate candidates
    * an overlap spanning several shared bins would produce are
    * eliminated ARITHMETICALLY — a pair is emitted only from the bin
    * containing max(lStart, rStart), which both intervals provably
    * cover — never by a distinct. Replication factor per row is
    * ceil(len/binWidth) + 1, so `binWidth` should sit near the typical
    * interval length; a hot key spreads over its bins instead of one
    * reducer. Bounds must be non-negative integers with start ≤ end.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, key: String,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  binWidth: Long, rightPayload: Seq[String]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lCols = left.columns.toSeq
    val l = left.withColumn("_lb",
      explode(sequence(expr(s"$lStart div $binWidth"),
        expr(s"$lEnd div $binWidth"))))
    val r = right.select(
        (col(key).as("_rk") +: col(rStart).as("_rs") +:
          col(rEnd).as("_re") +:
          rightPayload.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("_rb", explode(sequence(expr(s"_rs div $binWidth"),
        expr(s"_re div $binWidth"))))
    l.join(r, col(key) === col("_rk") && col("_lb") === col("_rb") &&
        col(lStart) <= col("_re") && col("_rs") <= col(lEnd) &&
        col("_lb") === expr(s"greatest($lStart, _rs) div $binWidth"))
      .select(lCols.map(col) ++
        Seq(col("_rs").as(s"r_$rStart"), col("_re").as(s"r_$rEnd")) ++
        rightPayload.map(c => col(s"r_$c")): _*)
  }
}
