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

  test("checkpoint state is rotated: O(1) live RDDs, not O(iters)") {
    // 20 iterations used to leave 20 superseded rank checkpoints (plus
    // e0 and nodes) in the storage pool — at sf10 that saturated the
    // pool and convoyed every task on the UnifiedMemoryManager monitor
    // (jstack: 18-30 of 32 threads BLOCKED in acquireExecutionMemory).
    // After rotation the only blocks that survive the run are the
    // returned ranks checkpoint and the scoped edge-table pin.
    val sc = spark.sparkContext
    val (before, after) = graft.core.Pins.scoped {
      val b = sc.getPersistentRDDs.keySet
      PageRank.ranks(graph, iters = 20).collect()
      (b, sc.getPersistentRDDs.keySet)
    }
    val leaked = (after -- before).size
    assert(leaked <= 2, s"expected <=2 live RDDs after 20 iters, got $leaked")
  }

  test("connectedComponents rotates its label checkpoints too") {
    import spark.implicits._
    // a 9-node path graph forces several pointer-jumping rounds
    val edges = (0 until 8).map(i => (s"n$i", s"n${i + 1}"))
      .toDF("i", "j")
    val sc = spark.sparkContext
    val (before, after) = graft.core.Pins.scoped {
      val b = sc.getPersistentRDDs.keySet
      val labels = Dedup.connectedComponents(edges).collect()
      assert(labels.map(_.getString(1)).distinct.length == 1) // one comp
      (b, sc.getPersistentRDDs.keySet)
    }
    val leaked = (after -- before).size
    assert(leaked <= 1, s"expected <=1 live RDD after CC, got $leaked")
  }
}
