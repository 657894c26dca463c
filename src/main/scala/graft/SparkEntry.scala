package graft

import graft.queries._
import graft.surv.ChurnView
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator surface (one entry per
  * SURVEY §2 operator); `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ChurnView.build(spark, "/root/testdata/sf0.001")

  private val providers: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (SurvQueries.queries, SurvQueries.oracles),
      (EvalQueries.queries, EvalQueries.oracles),
      (ModelQueries.queries, ModelQueries.oracles),
      (DiscreteQueries.queries, DiscreteQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (SimQueries.queries, SimQueries.oracles),
      (StreamQueries.queries, StreamQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    providers.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  def oracleSql: Map[String, String] =
    providers.map(_._2).reduce(_ ++ _)
}
