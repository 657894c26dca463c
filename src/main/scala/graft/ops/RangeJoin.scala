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
}
