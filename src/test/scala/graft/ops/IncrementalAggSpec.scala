package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("fold of a delta equals the full recompute; new and untouched keys") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val delta = Seq((1L, 30.0), (3L, 7.0)).toDF("k", "v")
    val inc = IncrementalAgg.readout(
      IncrementalAgg.merge(IncrementalAgg.build(base, "k", "v"),
        delta, "k", "v"), "k")
    val full = IncrementalAgg.readout(
      IncrementalAgg.build(base.unionByName(delta), "k", "v"), "k")
    assert(inc.exceptAll(full).count() == 0)
    assert(full.exceptAll(inc).count() == 0)
    val got = inc.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got(1L) == ((3L, 20.0, 10.0, 30.0))) // n, mean, mn, mx
    assert(got(2L)._1 == 1L)                    // untouched key intact
    assert(got(3L) == ((1L, 7.0, 7.0, 7.0)))    // delta-only key appears
  }

  test("empty delta is the identity") {
    import spark.implicits._
    val base = IncrementalAgg.build(
      Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v"), "k", "v")
    val merged = IncrementalAgg.merge(base,
      Seq.empty[(Long, Double)].toDF("k", "v"), "k", "v")
    assert(merged.exceptAll(base).count() == 0)
    assert(base.exceptAll(merged).count() == 0)
  }
}
