package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Both driver-testdata vintages of `events.ts` must normalize to the
  * same NTZ timestamp / epoch-micros values: raw-nanos BIGINT (the
  * TIMESTAMP(NANOS)-under-nanosAsLong read) and timestamp[us]
  * (TIMESTAMP_NTZ read). The normalization is timezone-FREE — every
  * epoch/trunc computation goes through NTZ arithmetic
  * (timestamp_diff/timestamp_add against the NTZ epoch), never an
  * NTZ→LTZ session-zone cast — so a vanilla SparkSession with any
  * `spark.sql.session.timeZone` computes identical values (pinned by
  * the cross-session test below).
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val micros = 1706140800123456L // 2024-01-25T00:00:00.123456Z

  test("normTs/tsMicros: raw-nanos BIGINT vintage") {
    import spark.implicits._
    val df = Seq(micros * 1000 + 789).toDF("ts") // sub-µs nanos truncate
    assert(df.schema("ts").dataType == LongType)
    val ts = df.select(Tables.normTs(df).as("ts"))
    assert(ts.schema("ts").dataType == TimestampNTZType)
    assert(ts.select(Tables.ntzMicros(col("ts"))).head().getLong(0) == micros)
    assert(df.select(Tables.tsMicros(df)).head().getLong(0) == micros)
  }

  test("normTs/tsMicros: timestamp vintage (NTZ and LTZ)") {
    import spark.implicits._
    val ntz = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val normed = ntz.select(Tables.normTs(ntz).as("ts"))
    assert(normed.schema("ts").dataType == TimestampNTZType)
    assert(normed.select(Tables.ntzMicros(col("ts"))).head().getLong(0)
      == micros)
    assert(ntz.select(Tables.tsMicros(ntz)).head().getLong(0) == micros)
    // a genuine instant column passes through and keeps its epoch
    val ltz = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(ltz.select(Tables.normTs(ltz).as("ts")).schema("ts").dataType
      == TimestampType)
    assert(ltz.select(Tables.tsMicros(ltz)).head().getLong(0) == micros)
  }

  test("truncNtz: hour floor and Monday-anchored week floor") {
    import spark.implicits._
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val hourUs = 3600L * 1000000L
    val hour = df.select(
      Tables.ntzMicros(Tables.truncNtz(col("ts"), hourUs))).head().getLong(0)
    assert(hour == (micros / hourUs) * hourUs)
    // 2024-01-25 is a Thursday; its ISO week starts Monday 2024-01-22
    val week = df.select(Tables.ntzMicros(Tables.truncNtz(col("ts"),
      7L * 86400000000L, anchorUs = -3L * 86400000000L))).head().getLong(0)
    assert(week == 1705881600000000L) // 2024-01-22T00:00:00Z
  }

  test("ts arithmetic is identical under a non-UTC session timezone") {
    // A cloned session running America/New_York must produce the SAME
    // epochs, dates, and truncations as the UTC test session — the
    // self-sufficiency contract for query functions handed a vanilla
    // SparkSession (driver-gate robustness).
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    val dir = "/root/testdata/sf0.001"
    def probe(s: org.apache.spark.sql.SparkSession): Seq[(Long, String, Long)] = {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_id") <= 50)
        .select(col("event_id"),
          to_date(col("ts")).cast("string").as("d"),
          Tables.ntzMicros(Tables.truncNtz(col("ts"), 3600L * 1000000L))
            .as("hour_us"))
        .orderBy("event_id")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    }
    val utcRows = probe(spark)
    val nyRows = probe(ny)
    assert(utcRows.nonEmpty)
    assert(utcRows == nyRows)
    val utcMicros = Tables.eventsMicros(spark, dir)
      .filter(col("event_id") <= 50).orderBy("event_id")
      .select(col("ts")).collect().map(_.getLong(0)).toSeq
    val nyMicros = Tables.eventsMicros(ny, dir)
      .filter(col("event_id") <= 50).orderBy("event_id")
      .select(col("ts")).collect().map(_.getLong(0)).toSeq
    assert(utcMicros == nyMicros)
  }

  test("ntzMicros crosses DST boundaries intact under a non-UTC session") {
    // New York's offset differs between January (-5h) and July (-4h);
    // a session-zone NTZ→LTZ shortcut would shift the two epochs by
    // different amounts. Non-foldable path: write NTZ parquet, read it
    // back under the America/New_York session.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ntz_dst").toString
    Seq(1706140800123456L, // 2024-01-25T00:00:00.123456Z (winter)
        1721044800000000L) // 2024-07-15T12:00:00Z        (summer)
      .toDF("us")
      .select(col("us"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(tmp)
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    val got = ny.read.parquet(tmp)
      .select(col("us"), Tables.ntzMicros(col("ts")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (want, m) => assert(m == want, s"epoch $want -> $m") }
  }
}
