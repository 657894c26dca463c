package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization: group a key's time-ordered events
  * into sessions, starting a new session whenever the gap from the
  * previous event exceeds `gap` (same unit as the time column).
  *
  * The streaming flavor lives in
  * `streaming/StreamingOps.scala` (`session_window`); this is the
  * batch twin for historical backfill. Reference analogue: the
  * event-stream shaping the churn tutorial does upstream of the
  * survival dataset (README.md:63-78 feeds per-user activity spans).
  *
  * Scale: ONE shuffle on `key`. Both window expressions (the lag
  * boundary flag and the running boundary sum) share the same
  * (key)-partitioned (time, tiebreak...) sort, so Spark evaluates
  * them in a single WindowExec pass — no second exchange, no global
  * window. Session numbering is per-key (1, 2, ...), so the ids are
  * deterministic under any partitioning and need no global
  * coordination; downstream aggregation groups on (key, session_no),
  * which re-uses the same hash partitioning.
  */
object Sessionize {

  /** Every input row + `session_no` (1-based per key, in time order).
    * `tiebreak` columns make the in-key order total when times can
    * collide (pass the event id).
    */
  def assign(df: DataFrame, key: String, time: String, gap: Long,
             tiebreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(time) +: tiebreak.map(col): _*)
    val boundary = when(
      lag(col(time), 1).over(w).isNull ||
        col(time) - lag(col(time), 1).over(w) > gap, 1L).otherwise(0L)
    df.withColumn("session_no",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** One row per (key, session): bounds, size, and an exact DECIMAL
    * sum of `valueCol` (order-independent — see RelationalQueries
    * dsum note). Groups on (key, session_no): same partitioning the
    * assignment shuffle produced.
    */
  def sessions(df: DataFrame, key: String, time: String, gap: Long,
               valueCol: Column, tiebreak: Seq[String] = Nil): DataFrame =
    assign(df, key, time, gap, tiebreak)
      .groupBy(col(key), col("session_no"))
      .agg(
        min(col(time)).as("start_t"),
        max(col(time)).as("end_t"),
        count(lit(1)).as("n_events"),
        valueCol.as("sum_value"))
}
