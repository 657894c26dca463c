package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("profiler: one pass, known stats, numeric vs string metric sets") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0), "ab"), (2L, Some(4.0), "xyz"),
      (3L, None, "ab")).toDF("id", "v", "s")
    val got = Profile.summarize(df, Seq("id", "v", "s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("id", "n")) == 3.0 && got(("id", "nulls")) == 0.0)
    assert(got(("v", "n")) == 2.0 && got(("v", "nulls")) == 1.0)
    assert(got(("v", "distinct")) == 2.0)
    assert(got(("v", "min")) == 2.0 && got(("v", "max")) == 4.0)
    assert(got(("v", "mean")) == 3.0)
    assert(got(("s", "min_len")) == 2.0 && got(("s", "max_len")) == 3.0)
    // string columns have no numeric-only metrics and vice versa
    assert(!got.contains(("s", "mean")) && !got.contains(("v", "min_len")))
  }

  test("approx-distinct flavor: same metric set, near-exact at small cardinality") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 37)).toDF("id", "m")
    val exact = Profile.summarize(df, Seq("id", "m")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val approx = Profile.summarize(df, Seq("id", "m"),
        exactDistinct = false).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(approx.keySet == exact.keySet)
    assert(math.abs(approx(("m", "distinct")) - 37.0) / 37.0 < 0.05)
    assert(math.abs(approx(("id", "distinct")) - 1000.0) / 1000.0 < 0.05)
    // non-distinct metrics identical in both flavors
    assert(approx(("id", "mean")) == exact(("id", "mean")))
  }

  test("quality checks: each gate counts its violations") {
    import spark.implicits._
    import QualityChecks.{accepted, completeness, range, referential, uniqueness}
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq((10L, Some(1L), "A", 0.5), (11L, Some(9L), "B", 1.5),
      (11L, None, "A", -0.1)).toDF("id", "fk", "status", "x")
    val got = QualityChecks.run(Seq(
      uniqueness("uniq", child, Seq("id")),
      completeness("compl", child, "fk"),
      referential("ref", child, "fk", parent, "pk"),
      accepted("acc", child, "status", Seq("A")),
      range("rng", child, "x", 0.0, 1.0))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("uniq" -> 1L, "compl" -> 1L, "ref" -> 1L,
      "acc" -> 1L, "rng" -> 2L))
  }
}
