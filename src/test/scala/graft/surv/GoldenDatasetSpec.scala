package graft.surv

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tier-1 golden tests: the reference's own unit expectations, ported
  * exactly (reference: tests/test_dataset.py:6-88; FIXTURES.md §1).
  * Frame rows are `[i, 2i, 3i, "a"*i]` with columns A(time), B(event),
  * C(numeric feature), D(categorical feature).
  */
class GoldenDatasetSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tiny(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i, 2 * i, 3 * i, "a" * i)).toDF("A", "B", "C", "D")
  }

  private def ds(n: Int) =
    SurvDataset.fromDataFrame(tiny(n), Seq(col("A")), "A", "B")

  test("encoded feature names match sklearn convention (test_dataset.py:23)") {
    assert(ds(3).encodedFeatures == Seq("C", "D_a", "D_aa", "D_aaa"))
  }

  test("90/10 ordered head/tail split values (test_dataset.py:29-36)") {
    val d = ds(3)
    assert(d.n == 3 && d.trainLen == 2)
    val tr = d.train.select("A", "B").orderBy("A").collect().map(r => (r.getInt(0), r.getInt(1)))
    val te = d.test.select("A", "B").orderBy("A").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(tr.toSeq == Seq((1, 2), (2, 4)))
    assert(te.toSeq == Seq((3, 6)))
  }

  test("split lengths and feature counts (test_dataset.py:39-51)") {
    val d = ds(10)
    assert(d.trainLen == 9 && d.testLen == 1)
    assert(d.numFeatures == 11) // C + 10 one-hot of D
  }

  test("batch shapes incl. short last batch (test_dataset.py:63-82)") {
    val d = ds(10)
    val b1 = d.tensorized(d.batch(d.train, 0, 5)).collect()
    val b2 = d.tensorized(d.batch(d.train, 5, 5)).collect()
    assert(b1.length == 5 && b2.length == 4)
    assert(b1.forall(_.getSeq[Float](1).size == 11))
  }

  test("unknown categories encode to all-zeros (test_dataset.py:84-88)") {
    import spark.implicits._
    val d = ds(3)
    val unseen = Seq((9, 2, 1, "zzz")).toDF("A", "B", "C", "D")
    val row = d.encode(unseen).select(d.encodedFeatures.map(col): _*).head()
    assert(row.getInt(0) == 1)            // C passes through
    assert((1 to 3).forall(row.getInt(_) == 0)) // one-hots all zero
  }

  test("string time/event column raises (dataset.py:58-62)") {
    intercept[IllegalArgumentException] {
      SurvDataset.fromDataFrame(tiny(3), Seq(col("A")), "D", "B")
    }
    intercept[IllegalArgumentException] {
      SurvDataset.fromDataFrame(tiny(3), Seq(col("A")), "A", "D")
    }
  }

  test("unknown explicit feature and bad trainRatio fail with named " +
    "errors, not deep analysis failures") {
    val e1 = intercept[IllegalArgumentException] {
      SurvDataset.fromDataFrame(tiny(3), Seq(col("A")), "A", "B",
        features = Some(Seq("nope")))
    }
    assert(e1.getMessage.contains("'nope'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SurvDataset.fromDataFrame(tiny(3), Seq(col("A")), "A", "B",
        trainRatio = 1.5)
    }
    assert(e2.getMessage.contains("trainRatio"), e2.getMessage)
  }

  test("stable order rn equals rank of order key") {
    val d = ds(10)
    val got = d.df.select("A", "rn").orderBy("A").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == (1 to 10).map(i => (i, (i - 1).toLong)))
  }

  test("stable order: per-partition offset is an O(1) array lookup, " +
      "not a width-deep CASE WHEN chain") {
    import spark.implicits._
    // the retired foldLeft(when(_pid === p, off)) built one CaseWhen
    // branch PER PARTITION, evaluated per row and duplicated per rn
    // reference after pushdown — O(width) per row (q_pair_rank burned
    // 2300 execCpu-s at width 128 / sf10 vs 26 at width 32) and
    // analyzer-hostile at cluster widths. The offset must stay a
    // constant-foldable array indexed by _pid.
    val df = (1L to 1000L).toDF("k")
    val (withRn, n) = graft.core.StableOrder.withRowNumber(
      df, Seq(col("k")), numPartitions = 64)
    assert(n == 1000L)
    val plan = withRn.queryExecution.analyzed.toString
    assert(!plan.contains("CASE WHEN (_pid"),
      s"per-pid CaseWhen chain is back in the rn projection:\n${plan.take(1500)}")
    assert(plan.contains("element_at"),
      s"expected the literal-array offset lookup in:\n${plan.take(1500)}")
    // rn semantics unchanged at a width where partitions may be empty
    val got = withRn.select("k", "rn").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (1L to 1000L).map(i => (i, i - 1)))
  }

  test("stable order: ANSI mode, empty partitions, width >> rows") {
    // adversarial review of the r17 element_at rewrite (VERDICT r18
    // item 2a): under ANSI, element_at THROWS on an out-of-bounds
    // index instead of returning null — the offsets array must cover
    // every pid spark_partition_id can emit even when RangePartitioner
    // returns fewer partitions than requested (5 rows at width 64
    // leave most partitions empty) and when the data is skewed onto
    // one key range.
    import spark.implicits._
    val old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = Seq(5, 3, 9, 1, 7).toDF("k")
      val (withRn, n) = graft.core.StableOrder.withRowNumber(
        df, Seq(col("k")), numPartitions = 64)
      assert(n == 5L)
      val got = withRn.select("k", "rn").orderBy("rn").collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      assert(got.toSeq ==
        Seq((1, 0L), (3, 1L), (5, 2L), (7, 3L), (9, 4L)))
      // skew: one repeated-range key block plus a lone outlier
      val skew = ((1 to 500).map(_ => 7) :+ 9999).zipWithIndex
        .map { case (v, i) => v * 100000 + i } // unique, heavily skewed
        .toDF("k")
      val (rn2, n2) = graft.core.StableOrder.withRowNumber(
        skew, Seq(col("k")), numPartitions = 32)
      assert(n2 == 501L)
      assert(rn2.agg(min("rn"), max("rn"), countDistinct("rn"))
        .head() == org.apache.spark.sql.Row(0L, 500L, 501L))
    } finally spark.conf.set("spark.sql.ansi.enabled", old)
  }

  test("duration cuts: equidistant, clamped index (dataset.py:122-132)") {
    val d = ds(10)
    val cuts = DurationCuts.fit(d.train, "A", 5) // train A = 1..9
    assert(cuts.cuts.toSeq == Seq(1.0, 3.0, 5.0, 7.0, 9.0))
    val idx = d.df.select(cuts.indexCol(col("A")).as("i")).orderBy(col("rn"))
      .collect().map(_.getInt(0))
    // A=1..10 → floor((t-1)/2) clamped to [0,4]
    assert(idx.toSeq == Seq(0, 0, 1, 1, 2, 2, 3, 3, 4, 4))
  }

  test("source provider: conf-keyed selection, unknown key rejected") {
    import graft.core.{SourceProvider, Tables}
    import org.apache.spark.sql.{DataFrame, SparkSession}
    object FakeSource extends SourceProvider {
      def table(s: SparkSession, dir: String, name: String): DataFrame = {
        import s.implicits._
        Seq((dir, name)).toDF("dir", "name")
      }
    }
    Tables.registerProvider("fake", FakeSource)
    try {
      spark.conf.set(Tables.SourceKey, "fake")
      val r = Tables.load(spark, "/idx", "customer").head()
      assert(r.getString(0) == "/idx" && r.getString(1) == "customer")
      spark.conf.set(Tables.SourceKey, "nope")
      intercept[IllegalArgumentException] {
        Tables.load(spark, "/idx", "customer")
      }
    } finally spark.conf.unset(Tables.SourceKey)
    // default (parquet) path restored for every other suite
    assert(Tables.load(spark, "/root/testdata/sf0.001", "nation").count() > 0)
  }

  test("JsonlSource: a second real format behind the seam, engine-parity") {
    import graft.core.Tables
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("jsonl_src").toString
    docs.coalesce(1).write.json(s"$tmp/documents.jsonl")
    Tables.registerProvider("jsonl",
      new graft.core.JsonlSource(Map("documents" -> docs.schema)))
    try {
      spark.conf.set(Tables.SourceKey, "jsonl")
      // run a REAL engine operator through the seam and compare to the
      // parquet answer — identical rows, identical schema
      val viaJson = graft.ops.Dedup.exactGroups(
        Tables.load(spark, tmp, "documents"), "doc_id", "text")
      spark.conf.unset(Tables.SourceKey)
      val viaParquet = graft.ops.Dedup.exactGroups(
        Tables.load(spark, dir, "documents"), "doc_id", "text")
      assert(viaJson.schema == viaParquet.schema)
      assert(viaJson.exceptAll(viaParquet).count() == 0)
      assert(viaParquet.exceptAll(viaJson).count() == 0)
    } finally spark.conf.unset(Tables.SourceKey)
  }
}
