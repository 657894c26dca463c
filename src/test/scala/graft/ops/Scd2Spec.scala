package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("run collapse, open last version, zero-length drop") {
    import spark.implicits._
    // user 1: A(10) A(20) B(30) B(35) A(40)  -> [10,30)A [30,40)B [40,∞)A
    // user 2: A(10) B(10)                    -> tiebreak: A's version is
    //                                           zero-length, dropped
    val ev = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "A"), (1L, 3L, 30L, "B"),
      (1L, 4L, 35L, "B"), (1L, 5L, 40L, "A"),
      (2L, 6L, 10L, "A"), (2L, 7L, 10L, "B"))
      .toDF("u", "id", "t", "attr")
    val got = Scd2.intervals(ev, "u", "t", "attr", Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (1L, "A", 10L, Some(30L)), (1L, "B", 30L, Some(40L)),
      (1L, "A", 40L, None), (2L, "B", 10L, None)))
  }

  test("point-in-time: boundary goes to the new version; pre-history is null") {
    import spark.implicits._
    val dim = Scd2.intervals(
      Seq((1L, 1L, 10L, "A"), (1L, 2L, 30L, "B")).toDF("u", "id", "t", "attr"),
      "u", "t", "attr", Seq("id"))
    val facts = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 29L),
      (103L, 1L, 30L), (104L, 1L, 99L)).toDF("fid", "u", "t")
    val got = Scd2.pointInTime(facts, dim, "u", "t", "attr").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (100L, None), (101L, Some("A")), (102L, Some("A")),
      (103L, Some("B")), (104L, Some("B"))))
  }

  test("incremental merge equals full recompute; untouched keys verbatim") {
    import spark.implicits._
    val base = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 30L, "B"),   // key 1: will be touched
      (2L, 3L, 10L, "A"), (2L, 4L, 50L, "C"))   // key 2: untouched
      .toDF("u", "id", "t", "attr")
    // key 1's delta extends history AND a brand-new key 3 appears
    val delta = Seq((1L, 5L, 40L, "A"), (3L, 6L, 5L, "Z"))
      .toDF("u", "id", "t", "attr")
    val inc = Scd2.mergeIntervals(base, delta, "u", "t", "attr", Seq("id"))
    val full = Scd2.intervals(base.unionByName(delta), "u", "t", "attr",
      Seq("id"))
    assert(inc.exceptAll(full).count() == 0)
    assert(full.exceptAll(inc).count() == 0)
    // key 2 never replays: its rows come from the anti-join branch
    val k2 = inc.filter($"u" === 2L).collect()
    assert(k2.length == 2)
  }

  test("null attribute participates in run semantics") {
    import spark.implicits._
    val ev = Seq((1L, 1L, 10L, null), (1L, 2L, 20L, null),
      (1L, 3L, 30L, "A")).toDF("u", "id", "t", "attr")
    val got = Scd2.intervals(ev, "u", "t", "attr", Seq("id")).collect()
      .map(r => (Option(r.get(1)).map(_.toString), r.getLong(2)))
      .sortBy(_._2)
    assert(got.toSeq == Seq((None, 10L), (Some("A"), 30L)))
  }
}
