package graft.core

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r20 exploding-stage width contract: rows-proportional,
  * floored at 1, capped at min(session shuffle width, 2× cores) — the
  * cap is what guarantees full machine width at corpus scale while a
  * probe-scale input gets probe-scale parallelism (the r19 verdict's
  * pre-explosion-bytes blind spot, OPTIMIZATION_r20.md change 1).
  */
class WidthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def cap: Int = {
    val sessionParts =
      spark.conf.get("spark.sql.shuffle.partitions").toLong
    math.max(1L, math.min(sessionParts,
      2L * spark.sparkContext.defaultParallelism)).toInt
  }

  test("explode caps at min(session shuffle width, 2x cores)") {
    assert(Width.explode(spark) === cap)
    assert(Width.explode(spark) >= 1)
  }

  test("explodeRows: floor 1, rows-proportional, machine-width cap") {
    assert(Width.explodeRows(spark, 0L, 75000L) === 1)
    assert(Width.explodeRows(spark, 74999L, 75000L) === 1)
    // proportional region (clamped by the cap when the cap is small)
    val mid = Width.explodeRows(spark, 75000L * 3, 75000L)
    assert(mid === math.min(4, cap))
    // a corpus-scale count always binds at the cap
    assert(Width.explodeRows(spark, Long.MaxValue / 2, 75000L) === cap)
  }
}
