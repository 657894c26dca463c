package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — the materialized-rollup upsert:
  * fold a delta batch into an existing per-key aggregate table
  * without touching keys the delta doesn't mention. The aggregate
  * state is the mergeable triple (n, Σx as DECIMAL, min, max) — sums
  * stay DECIMAL in the STORED table so merge order never matters;
  * the double projection happens only at read time.
  *
  * Scale: the delta pre-aggregates to one row per touched key
  * (map-side combined), then a single keyed outer join folds it into
  * the base — work ∝ |delta| + |touched base rows|, the same
  * incremental contract as [[Scd2.mergeIntervals]]. Equivalence with
  * the full recompute over base ∪ delta events is the oracle.
  */
object IncrementalAgg {

  /** Per-key aggregate state of an event set: (key, n, sum_dec, mn,
    * mx). `decScale` fixes the DECIMAL scale of the stored sum.
    */
  def build(events: DataFrame, key: String, valueCol: String,
            decScale: Int = 6): DataFrame =
    events.groupBy(col(key)).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast(DecimalType(38, decScale))).as("sum_dec"),
      min(col(valueCol)).as("mn"),
      max(col(valueCol)).as("mx"))

  /** Fold a delta event batch into an existing state table. */
  def merge(base: DataFrame, deltaEvents: DataFrame, key: String,
            valueCol: String, decScale: Int = 6): DataFrame = {
    val d = build(deltaEvents, key, valueCol, decScale)
      .select(col(key), col("n").as("_dn"), col("sum_dec").as("_ds"),
        col("mn").as("_dmn"), col("mx").as("_dmx"))
    base.join(d, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n"),
        (coalesce(col("sum_dec"), lit(0).cast(DecimalType(38, decScale)))
          + coalesce(col("_ds"), lit(0).cast(DecimalType(38, decScale))))
          .cast(DecimalType(38, decScale)).as("sum_dec"),
        least(col("mn"), col("_dmn")).as("mn"),
        greatest(col("mx"), col("_dmx")).as("mx"))
  }

  /** Read-time projection: mean from the exact stored sum. */
  def readout(state: DataFrame, key: String): DataFrame =
    state.select(col(key), col("n"),
      col("sum_dec").cast("double").as("sum_value"),
      (col("sum_dec").cast("double") / col("n").cast("double")).as("mean"),
      col("mn"), col("mx"))
}
