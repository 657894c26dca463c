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

  /** Normalize an events `ts` column to session-zone TimestampType,
    * robust to both driver testdata vintages: TIMESTAMP(NANOS) read as
    * a raw-nanos BIGINT (needs `spark.sql.legacy.parquet.nanosAsLong=
    * true`, set by the Verify/Bench/test sessions) and the current
    * timestamp[us] written as TIMESTAMP_NTZ. Sessions run with
    * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast is
    * value-preserving and `unix_micros` reads the same epoch the
    * DuckDB oracle's `epoch_us(ts)` does.
    */
  def normTs(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000"))
      case TimestampType => col("ts")
      case _ => col("ts").cast(TimestampType)
    }
  }

  /** events `ts` as epoch-microsecond BIGINT (schema-aware twin of
    * [[normTs]] — the form the interval/as-of/sessionize queries key
    * arithmetic on).
    */
  def tsMicros(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    df.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _ => unix_micros(normTs(df))
    }
  }

  /** `events` with `ts` surfaced as a proper TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.withColumn("ts", normTs(df))
  }

  /** `events` with `ts` as epoch-microsecond BIGINT. */
  def eventsMicros(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.withColumn("ts", tsMicros(df))
  }
}
