package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join — for each left row, the single
  * most recent right row with the same key and right time <= left
  * time. Spark has no native ASOF JOIN; the naive formulations are a
  * range join (quadratic per key after the equi-join, then an argmax
  * shuffle) or a windowed subquery per side. This is the scalable
  * union-scan shape instead:
  *
  *   1. tag both inputs and union them (no join),
  *   2. ONE shuffle on the key, sort within partition by
  *      (time, tag, right-time tiebreak),
  *   3. running `last(right payload, ignoreNulls)` carries the latest
  *      preceding right row forward in the sort order,
  *   4. keep the left rows.
  *
  * Cost is one shuffle + an in-partition sort — linear in |L|+|R| per
  * key, no candidate blowup, skew-bounded by the largest single key
  * (same bound as any keyed window). Ties on time prefer the right row
  * (tag 0 sorts first), i.e. `right.t <= left.t` inclusive semantics —
  * matching DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`,
  * which is the oracle for `q_asof_attrib`.
  */
object AsofJoin {

  /** Backward as-of join of `left` and `right` on `key` with
    * `leftTime`/`rightTime` (both orderable, e.g. long nanos).
    * `rightPayload` columns come back null when no right row precedes
    * the left row. Output: all `left` columns + `rightPayload`
    * (prefixed `r_`).
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // SQL join equality never matches NULL = NULL, but a window
    // partitionBy groups NULL keys into ONE partition — so null-key /
    // null-time right rows are dropped up front (they can never be an
    // ASOF match: `l.t >= NULL` is unknown). Left rows keep their null
    // keys and simply find no preceding right row (match = null); a
    // null LEFT time sorts first within its key partition (nulls-first
    // asc) and likewise matches nothing — both mirror SQL semantics.
    // Right rows tied on exact (key, time) are collapsed to the
    // lexicographically-greatest payload struct BEFORE the scan: the
    // pick is deterministic and the oracle mirrors it with a GROUP BY
    // (DuckDB ASOF's own choice between tied right rows is
    // unspecified, which would flake the hash on tie-bearing inputs).
    val rDedup = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .groupBy(col(key).as("_k"), col(rightTime).as("_t"))
      .agg(max(struct(rightPayload.map(col): _*)).as("_rp"))
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_tag"),
      struct(lCols.map(col): _*).as("_lp"),
      lit(null).cast(right.select(rightPayload.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
        .as("_rp"))
    val r = rDedup.select(
      col("_k"), col("_t"), lit(0).as("_tag"),
      lit(null).cast(left.select(lCols.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
        .as("_lp"),
      col("_rp"))
    // right rows are unique per (_k, _t) after the collapse, so
    // (time, tag) is a total order within every key partition
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (r unionByName l)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(lCols.map(c => col(s"_lp.$c").as(c)) ++
        rightPayload.map(c => col(s"_match.$c").as(s"r_$c")): _*)
  }

  /** Backward as-of join with a tolerance bound: the match must lie
    * within `tolerance` time units before the left row (inclusive),
    * the standard attribution-window semantics (DuckDB has no native
    * tolerance — pandas `merge_asof(tolerance=...)` is the reference
    * shape). Zero extra cost over [[backward]]: the latest preceding
    * right row is the ONLY asof candidate, so "latest within the
    * window" ≡ "latest overall, nulled when too old" — one projection
    * on top of the same single-shuffle scan, never a range-join
    * explosion.
    */
  def backwardWithin(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     rightPayload: Seq[String],
                     tolerance: Long): DataFrame = {
    val payload = (rightPayload :+ rightTime).distinct
    val j = backward(left, right, key, leftTime, rightTime, payload)
    val ok = col(s"r_$rightTime").isNotNull &&
      col(leftTime) - col(s"r_$rightTime") <= lit(tolerance)
    val kept = left.columns.toSeq.map(col) ++
      rightPayload.map(c => when(ok, col(s"r_$c")).as(s"r_$c"))
    j.select(kept: _*)
  }

  /** Forward as-of join — for each left row, the single EARLIEST right
    * row with the same key and right time >= left time (inclusive,
    * matching DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t <= r.t`).
    * Same union-scan shape as [[backward]], mirrored: left rows tag 0
    * so a same-time right row sorts INSIDE the left row's forward
    * frame, and the match is the frame's first non-null right payload
    * over [current, unboundedFollowing]. One shuffle, one in-partition
    * sort, linear per key.
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // same null + tie handling rationale as backward (see there)
    val rDedup = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .groupBy(col(key).as("_k"), col(rightTime).as("_t"))
      .agg(max(struct(rightPayload.map(col): _*)).as("_rp"))
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(0).as("_tag"),
      struct(lCols.map(col): _*).as("_lp"),
      lit(null).cast(right.select(rightPayload.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
        .as("_rp"))
    val r = rDedup.select(
      col("_k"), col("_t"), lit(1).as("_tag"),
      lit(null).cast(left.select(lCols.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
        .as("_lp"),
      col("_rp"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    (r unionByName l)
      // a NULL left time sorts FIRST ascending, so its forward frame
      // would span every right row and "match" the key's earliest one
      // — but SQL ASOF semantics (NULL <= t is unknown) and the
      // backward variant both yield NO match for a null time; guard it
      .withColumn("_match",
        when(col("_t").isNotNull,
          first(col("_rp"), ignoreNulls = true).over(w)))
      .filter(col("_tag") === 0)
      .select(lCols.map(c => col(s"_lp.$c").as(c)) ++
        rightPayload.map(c => col(s"_match.$c").as(s"r_$c")): _*)
  }

  /** Nearest as-of join — for each left row, the right row minimizing
    * |right time − left time|, ties to the PRECEDING side. BOTH
    * directions come out of ONE shuffle: the backward match is the
    * running last-non-null over [unboundedPreceding, current] and the
    * forward match the first-non-null over [current,
    * unboundedFollowing], two frames over the same key-partitioned
    * sort (right rows sort before left on equal times, so the
    * backward frame is `rt <= lt` inclusive and the forward frame is
    * strictly `rt > lt` — the tie belongs to backward, which is also
    * the |Δ| = 0 winner). `rightTime` must ride in `rightPayload` (it
    * is needed to compare the two candidates).
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.contains(rightTime),
      s"rightPayload must include $rightTime for the distance compare")
    val lCols = left.columns.toSeq
    val rDedup = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .groupBy(col(key).as("_k"), col(rightTime).as("_t"))
      .agg(max(struct(rightPayload.map(col): _*)).as("_rp"))
    val l = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_tag"),
      struct(lCols.map(col): _*).as("_lp"),
      lit(null).cast(right.select(rightPayload.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
        .as("_rp"))
    val r = rDedup.select(
      col("_k"), col("_t"), lit(0).as("_tag"),
      lit(null).cast(left.select(lCols.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
        .as("_lp"),
      col("_rp"))
    val sort = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
    val wb = sort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = sort.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val back = last(col("_rp"), ignoreNulls = true).over(wb)
    // null-left-time guard as in [[forward]] (nulls-first sort would
    // otherwise hand the row the key's earliest right match); backward
    // is naturally null-safe — the frame above a nulls-first row holds
    // no right rows
    val fwd = when(col("_t").isNotNull,
      first(col("_rp"), ignoreNulls = true).over(wf))
    val pick = when(col("_b").isNull, col("_f"))
      .when(col("_f").isNull, col("_b"))
      .when(col("_t") - col("_b").getField(rightTime)
        <= col("_f").getField(rightTime) - col("_t"), col("_b"))
      .otherwise(col("_f"))
    (r unionByName l)
      .withColumn("_b", back).withColumn("_f", fwd)
      .filter(col("_tag") === 1)
      .withColumn("_match", pick)
      .select(lCols.map(c => col(s"_lp.$c").as(c)) ++
        rightPayload.map(c => col(s"_match.$c").as(s"r_$c")): _*)
  }
}
