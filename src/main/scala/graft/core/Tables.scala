package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver testdata layout (`TESTDATA.md`),
  * routed through the [[SourceProvider]] seam: a connector registers
  * itself under a name ([[registerProvider]]) and a session selects it
  * with `spark.conf.set("graft.source", name)` — the reference's
  * ElasticSearch scan (src/elastic_surv/dataset.py:260) would be an
  * `org.elasticsearch.spark.sql`-backed provider on a connected
  * cluster. Selection is per-SparkSession (conf-scoped), so two
  * concurrent sessions in one JVM can read different backends; the
  * registry itself is append-only.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** conf key selecting the session's source provider */
  val SourceKey = "graft.source"

  private val providers =
    new java.util.concurrent.ConcurrentHashMap[String, SourceProvider]()
  providers.put("parquet", ParquetSource)

  /** Make a connector selectable via `spark.conf.set("graft.source", name)`. */
  def registerProvider(name: String, p: SourceProvider): Unit =
    providers.put(name, p)

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = spark.conf.get(SourceKey, "parquet")
    val p = providers.get(key)
    require(p != null, s"no SourceProvider registered under '$key' " +
      s"(available: ${providers.keySet()})")
    p.table(spark, dir, name)
  }

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
