package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver testdata layout (`TESTDATA.md`),
  * routed through the [[SourceProvider]] seam: swap `provider` to read
  * the same logical tables from a different backend (the reference's
  * ElasticSearch scan, src/elastic_surv/dataset.py:260, would be an
  * `org.elasticsearch.spark.sql`-backed provider on a connected
  * cluster).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Process-wide source; tests/connectors may swap it. */
  @volatile var provider: SourceProvider = ParquetSource

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    provider.table(spark, dir, name)

  /** `events` with its nanosecond timestamp surfaced as a proper
    * TimestampType column `ts` (microsecond truncation). Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by the
    * Verify/Bench/test sessions) because the parquet file stores
    * TIMESTAMP(NANOS) which Spark cannot read natively.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
