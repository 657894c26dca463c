package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grouped z-score anomaly flags over a metric stream — the outlier
  * gate a training pipeline runs before aggregating noisy telemetry
  * (and the reference tutorial's churn features would need upstream,
  * README.md:63-78).
  *
  * Scale shape: ONE map-side-combined groupBy for (n, Σx, Σx²) per
  * group — three numbers per group regardless of row count — then a
  * broadcast join back fused into the scan. No window over
  * low-cardinality partitions (a per-group RANGE frame would funnel
  * each group through one task; the moment-sketch join is
  * embarrassingly parallel). Sums route through DECIMAL so the stats
  * are order-independent; z is then identical-operand double
  * arithmetic (mean = Σx/n, var = Σx²/n − mean², IEEE sqrt) — the
  * FeatureScale determinism contract, per group.
  */
object Anomaly {

  /** Rows of `df` + `z` (per-`group` z-score of `valueCol`) +
    * `is_anomaly` (|z| > threshold). Constant groups (σ² ≤ 0 after
    * rounding) yield null z — a guarded CASE, not a NaN, because both
    * engines order NaN above every threshold and would otherwise flag
    * entire constant groups; null values pass through unflagged.
    */
  def zscoreFlags(df: DataFrame, group: String, valueCol: String,
                  threshold: Double = 3.0): DataFrame =
    applyStats(df, momentStats(df, group, valueCol), group, valueCol,
      threshold)

  /** The per-group moment sketch (n, Σx, Σx²) — the FIT half; store
    * it and score later batches/streams against it.
    */
  def momentStats(df: DataFrame, group: String,
                  valueCol: String): DataFrame =
    df.groupBy(col(group)).agg(
      count(col(valueCol)).cast("double").as("_n"),
      sum(col(valueCol).cast(DecimalType(30, 12))).cast("double").as("_s"),
      // 26 integer digits: Σx² stays finite for |x| up to ~1e10 over
      // trillion-row groups. At scale 24 only 14 integer digits remain
      // and the Spark decimal sum silently NULLs on overflow (every
      // row unflagged) while the oracle errors — a silent divergence.
      sum((col(valueCol) * col(valueCol)).cast(DecimalType(38, 12)))
        .cast("double").as("_sq"))

  /** Score rows against previously-fitted stats — the APPLY half;
    * works unchanged on a streaming DataFrame (stream-static
    * broadcast join per micro-batch). Groups absent from the stats
    * yield null z, unflagged.
    */
  def applyStats(df: DataFrame, stats: DataFrame, group: String,
                 valueCol: String, threshold: Double = 3.0): DataFrame = {
    val mean = col("_s") / col("_n")
    val variance = col("_sq") / col("_n") - mean * mean
    df.join(broadcast(stats), Seq(group), "left")
      .withColumn("z",
        when(variance > 0, (col(valueCol) - mean) / sqrt(variance)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > lit(threshold), lit(false)))
      .drop("_n", "_s", "_sq")
  }
}
