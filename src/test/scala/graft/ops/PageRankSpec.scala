package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // a -> b, a -> c, b -> c; c dangling. n = 3, all masses start at 1.
  private def graph = {
    import spark.implicits._
    Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
  }

  test("one iteration matches the hand-computed mass update") {
    val got = PageRank.ranks(graph, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // dangling mass = m(c) = 1; share = 1/3
    // a: .15 + .85*(0 + 1/3)            = .433333 (6dp)
    // b: .15 + .85*(1/2 + 1/3)          = .858333
    // c: .15 + .85*(1/2 + 1 + 1/3)      = 1.708333
    assert(math.abs(got("a") - 0.433333) < 1e-9)
    assert(math.abs(got("b") - 0.858333) < 1e-9)
    assert(math.abs(got("c") - 1.708333) < 1e-9)
    // mass is conserved up to the per-node 6dp rounding
    assert(math.abs(got.values.sum - 3.0) < 3e-6)
  }

  test("trajectory is partitioning-independent (bit-equal)") {
    val a = PageRank.ranks(graph.repartition(1), iters = 3).collect()
      .map(r => (r.getString(0), r.getDouble(2))).sortBy(_._1)
    val b = PageRank.ranks(graph.repartition(7), iters = 3).collect()
      .map(r => (r.getString(0), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("out-degree column and dangling bookkeeping") {
    val od = PageRank.ranks(graph, iters = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(od == Map("a" -> 2L, "b" -> 1L, "c" -> 0L))
  }
}
