package graft.surv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-hot encoding spec for a string (categorical) column.
  *
  * Semantics mirror the reference's sklearn
  * `OneHotEncoder(handle_unknown="ignore", sparse=False)` fit over the
  * full frame (reference: src/elastic_surv/dataset.py:78-106,172-187):
  *   - categories = sorted distinct non-null values (sklearn sorts);
  *   - output columns named `<col>_<value>` (sklearn
  *     `get_feature_names` convention, pinned by the reference's
  *     tests/test_dataset.py:23);
  *   - unknown values at transform time → all-zero row (parity with
  *     `handle_unknown="ignore"`).
  *
  * The fit is a Spark-side `distinct()` (one shuffle, combiner-side
  * dedup) instead of the reference's client-side row scan with early
  * exit (dataset.py:85-91). Intended for low-cardinality columns (the
  * spec is broadcast inside the generated `when` expressions — fully
  * codegen'd, no UDF).
  */
final case class OneHotSpec(column: String, categories: Seq[String]) {
  def outputCols: Seq[String] = categories.map(v => s"${column}_$v")

  /** 0/1 IntegerType columns; cast to float at tensorize time. */
  def exprs: Seq[Column] = categories.map { v =>
    when(col(column) === lit(v), 1).otherwise(0).as(s"${column}_$v")
  }

  /** Replace `column` with its one-hot columns (same position-free
    * semantics as dataset.py:185-186 concat+drop).
    */
  def transform(df: DataFrame): DataFrame = {
    val keep = df.columns.filterNot(_ == column).map(col).toSeq
    df.select(keep ++ exprs: _*)
  }
}

object OneHotSpec {
  def fit(df: DataFrame, column: String): OneHotSpec =
    fitAll(df, Seq(column)).head

  /** Fit several columns in ONE job: all distinct sets come from a
    * single aggregate pass (map-side-combined collect_set per column)
    * instead of one distinct() job per column. Same sorted categories
    * as per-column fits; intended for low-cardinality columns (the
    * sets travel through one aggregation row).
    */
  def fitAll(df: DataFrame, columns: Seq[String]): Seq[OneHotSpec] = {
    if (columns.isEmpty) return Seq.empty
    val aggs = columns.map(c => collect_set(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    columns.zipWithIndex.map { case (c, i) =>
      OneHotSpec(c, row.getSeq[String](i).sorted)
    }
  }
}
