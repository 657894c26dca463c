package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over the driver testdata layout
  * (`TESTDATA.md`): one parquet file per table under a scale-factor
  * directory. This is the stand-in for the reference's ElasticSearch
  * index scan (reference: src/elastic_surv/dataset.py:260) — the
  * architectural slot where an `org.elasticsearch.spark.sql` source
  * would plug in on a connected cluster.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
