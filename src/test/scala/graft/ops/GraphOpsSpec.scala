package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("copairs: distinct per basket, canonical order, support gate") {
    import spark.implicits._
    // basket 1: {a,b,c}; basket 2: {a,b} with a duplicated line;
    // basket 3: {b,c}
    val items = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "a"),
      (2L, "b"), (3L, "b"), (3L, "c")).toDF("bk", "it")
    val all = GraphOps.copairs(items, "bk", "it", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(all == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 2L))
    val supported = GraphOps.copairs(items, "bk", "it", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(supported == Set(("a", "b"), ("b", "c")))
  }

  test("triangle count: K4 has 4, square has 0, K4+pendant still 4") {
    import spark.implicits._
    def tri(e: Seq[(String, String)]): Long =
      GraphOps.triangleCount(e.toDF("i", "j")).head().getLong(0)
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"))
    assert(tri(k4) == 4L)
    assert(tri(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))) == 0L)
    assert(tri(k4 :+ ("d", "e")) == 4L)
  }
}
