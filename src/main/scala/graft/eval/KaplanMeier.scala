package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * map-side partial agg); the ordered windows then run over |distinct
  * t| rows only — bounded and small relative to subjects — so the
  * single-partition window is not the bottleneck it would be over raw
  * rows. The cumulative product is the [[graft.functions.ProductAgg]]
  * running window aggregate: O(1) per row (the collect_list form it
  * replaced copied the O(|frame|) buffer per row), multiplying factors
  * in ascending-t order left-to-right (exact frame order), which keeps
  * it bit-comparable with DuckDB's windowed product().
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
    val g = df.groupBy(t.cast("double").as("t"))
      .agg(sum(e.cast("long")).as("d"), count(lit(1)).as("m"))
    val w = Window.orderBy(col("t"))
    g.withColumn("n",
        sum(col("m")).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n").cast("double"))
      .withColumn("s",
        graft.functions.ProductAgg.product(col("factor"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("t"), col("d"), col("n"), col("s"))
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
