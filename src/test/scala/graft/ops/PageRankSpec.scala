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

  test("personalized: teleport + dangling mass land on the seed only") {
    import spark.implicits._
    val seeds = Seq("a").toDF("node")
    val got = PageRank.personalizedRanks(graph, seeds, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a: .85*0 + (.15*3/1 + .85*1/1) = 1.3 ; b: .85*.5 ; c: .85*1.5
    assert(math.abs(got("a") - 1.3) < 1e-9)
    assert(math.abs(got("b") - 0.425) < 1e-9)
    assert(math.abs(got("c") - 1.275) < 1e-9)
    assert(math.abs(got.values.sum - 3.0) < 3e-6) // mass conserved
    // a seed that is not a graph node contributes nothing (and an
    // all-out-of-graph seed set is rejected)
    val got2 = PageRank.personalizedRanks(graph,
      Seq("a", "zzz").toDF("node"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got2 == got)
    intercept[IllegalArgumentException] {
      PageRank.personalizedRanks(graph, Seq("zzz").toDF("node"), 1)
    }
  }

  test("out-degree column and dangling bookkeeping") {
    val od = PageRank.ranks(graph, iters = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(od == Map("a" -> 2L, "b" -> 1L, "c" -> 0L))
  }
}
