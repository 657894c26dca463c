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

  /** The NTZ epoch literal — anchor for timezone-free epoch
    * arithmetic on TIMESTAMP_NTZ columns.
    */
  def ntzEpoch: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    to_timestamp_ntz(lit("1970-01-01 00:00:00"))
  }

  /** Epoch micros of a TIMESTAMP_NTZ column, treating the wall-clock
    * value as UTC — identical to DuckDB's `epoch_us(naive ts)` under
    * ANY Spark session timezone. (The obvious
    * `unix_micros(cast(ts as timestamp))` interprets the wall time in
    * the SESSION zone and shifts by its offset; `timestamp_diff`
    * against the NTZ epoch never consults the session zone.)
    */
  def ntzMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_diff("MICROSECOND", ntzEpoch, c)
  }

  /** Truncate a TIMESTAMP_NTZ column to a whole multiple of `unitUs`
    * microseconds (hour = 3600e6, day = 86400e6) — the timezone-free
    * replacement for `date_trunc`, which casts NTZ through the
    * session zone. `anchorUs` shifts the grid (ISO weeks anchor on
    * Monday 1969-12-29 = −3 days). Floors in exact LONG arithmetic
    * (x − pmod(x, unit) — pmod is non-negative), so pre-1970
    * timestamps floor like `date_trunc` does instead of rounding
    * toward zero, and no double division enters the path.
    */
  def truncNtz(c: org.apache.spark.sql.Column, unitUs: Long,
               anchorUs: Long = 0L): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val x = ntzMicros(c) - lit(anchorUs)
    timestamp_add("MICROSECOND",
      (x - pmod(x, lit(unitUs))) + lit(anchorUs), ntzEpoch)
  }

  /** Normalize an events `ts` column to TIMESTAMP_NTZ, robust to both
    * driver testdata vintages: TIMESTAMP(NANOS) read as a raw-nanos
    * BIGINT (needs `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * the Verify/Bench/test sessions — a no-op on µs files) and the
    * current timestamp[us] written as TIMESTAMP_NTZ. NTZ is kept NTZ
    * (no session-zone cast), so every downstream epoch/trunc
    * computation — and the parquet bytes Verify writes — is identical
    * under ANY session timezone, matching the DuckDB oracle's
    * naive-timestamp semantics. A genuine TimestampType (instant)
    * column passes through unchanged.
    */
  def normTs(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        timestamp_add("MICROSECOND", expr("ts div 1000"), ntzEpoch)
      case TimestampType => col("ts")
      case TimestampNTZType => col("ts")
      case _ => col("ts").cast(TimestampNTZType)
    }
  }

  /** events `ts` as epoch-microsecond BIGINT (schema-aware twin of
    * [[normTs]] — the form the interval/as-of/sessionize queries key
    * arithmetic on). Timezone-free on every vintage.
    */
  def tsMicros(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampType => unix_micros(col("ts"))
      case _ => ntzMicros(normTs(df))
    }
  }

  /** `events` with `ts` surfaced as a TIMESTAMP_NTZ column. */
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
