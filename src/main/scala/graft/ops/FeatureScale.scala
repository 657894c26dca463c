package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric feature scaling for model input prep: z-score
  * standardization, min-max scaling, and robust (median/IQR)
  * scaling — the sklearn StandardScaler / MinMaxScaler /
  * RobustScaler trio a survival pipeline runs before the MLP
  * (reference pushes raw features to torch and relies on BN:
  * models/model_cox_ph.py:50-57; the explicit scalers are the
  * pipeline-side equivalent).
  *
  * Engine-exactness: sums route through DECIMAL (order-independent),
  * every derived stat is then plain double arithmetic on identical
  * operands (mean = sumD/n, var = ssqD/n − mean², IEEE sqrt), so the
  * scaled values hash-match an oracle computing the same shapes.
  *
  * Scale: ALL stats for ALL requested columns come out of ONE
  * aggregation pass; the transform is a broadcast of that single
  * 1-row stats frame fused into the scan — no second shuffle, no
  * driver round-trip in the plan. Caveat: the quartiles use exact
  * `percentile` (buffers per-task values) for oracle parity; at
  * 100 TB swap in `approx_percentile` or the k-min sample sketch
  * (`Sketches.kminSample`) — the transform side is unchanged.
  */
object FeatureScale {

  /** One-row stats frame: per column c, `c_sum, c_ssq, c_n, c_min,
    * c_max, c_q1, c_med, c_q3`. `decScale` is the column's decimal
    * precision (2 for money); squares use 2× the scale.
    */
  def stats(df: DataFrame, cols: Seq[(String, Int)]): DataFrame =
    df.agg(
      count(lit(1)).cast("double").as("n"),
      cols.flatMap { case (c, s) =>
        Seq(
          sum(col(c).cast(DecimalType(18, s))).cast("double")
            .as(s"${c}_sum"),
          sum((col(c) * col(c)).cast(DecimalType(18, 2 * s))).cast("double")
            .as(s"${c}_ssq"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"),
          expr(s"percentile($c, 0.25)").as(s"${c}_q1"),
          expr(s"percentile($c, 0.5)").as(s"${c}_med"),
          expr(s"percentile($c, 0.75)").as(s"${c}_q3"))
      }: _*)

  /** `df` + `<c>_z`, `<c>_mm`, `<c>_rb` per requested column. */
  def scaled(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    val st = broadcast(stats(df, cols))
    val out = df.crossJoin(st)
    val scaledCols = cols.flatMap { case (c, _) =>
      val mean = col(s"${c}_sum") / col("n")
      Seq(
        ((col(c) - mean) /
          sqrt(col(s"${c}_ssq") / col("n") - mean * mean)).as(s"${c}_z"),
        ((col(c) - col(s"${c}_min")) /
          (col(s"${c}_max") - col(s"${c}_min"))).as(s"${c}_mm"),
        ((col(c) - col(s"${c}_med")) /
          (col(s"${c}_q3") - col(s"${c}_q1"))).as(s"${c}_rb"))
    }
    out.select(df.columns.map(col) ++ scaledCols: _*)
  }
}
