package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Both driver-testdata vintages of `events.ts` must normalize to the
  * same timestamp/micros values: raw-nanos BIGINT (the
  * TIMESTAMP(NANOS)-under-nanosAsLong read) and timestamp[us]
  * (TIMESTAMP_NTZ read). Sessions run UTC, so the casts are
  * value-preserving.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val micros = 1706140800123456L // 2024-01-25T00:00:00.123456Z

  test("normTs/tsMicros: raw-nanos BIGINT vintage") {
    import spark.implicits._
    val df = Seq(micros * 1000 + 789).toDF("ts") // sub-µs nanos truncate
    assert(df.schema("ts").dataType == LongType)
    val ts = df.select(Tables.normTs(df).as("ts"))
    assert(ts.schema("ts").dataType == TimestampType)
    assert(ts.select(unix_micros(col("ts"))).head().getLong(0) == micros)
    assert(df.select(Tables.tsMicros(df)).head().getLong(0) == micros)
  }

  test("normTs/tsMicros: timestamp vintage (NTZ and LTZ)") {
    import spark.implicits._
    val ntz = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    assert(ntz.select(Tables.normTs(ntz).as("ts"))
      .select(unix_micros(col("ts"))).head().getLong(0) == micros)
    assert(ntz.select(Tables.tsMicros(ntz)).head().getLong(0) == micros)
    val ltz = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(ltz.select(Tables.normTs(ltz).as("ts"))
      .select(unix_micros(col("ts"))).head().getLong(0) == micros)
    assert(ltz.select(Tables.tsMicros(ltz)).head().getLong(0) == micros)
  }
}
