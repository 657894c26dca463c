package graft.sources

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  test("partitioned sink: pruned reads, bounded files per value, row parity") {
    val docs = Tables.load(spark, dir, "documents")
    val out = java.nio.file.Files.createTempDirectory("sink").toString + "/docs"
    Sink.writePartitioned(docs, out, Seq("lang"), filesPerValue = 2)

    val back = spark.read.parquet(out)
    // row parity (lang round-trips as a partition column)
    assert(back.count() == docs.count())
    assert(back.select(sum(col("n_chars"))).head().getLong(0) ==
      docs.select(sum(col("n_chars"))).head().getLong(0))

    // a lang predicate must reach the scan as a PartitionFilter —
    // directory pruning, not a row filter
    val plan = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\n", " ").matches(".*PartitionFilters: \\[[^]]*lang[^]]*\\].*"),
      s"no partition filter in:\n$plan")

    // file sizing: at most filesPerValue parquet files per lang value
    val langDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    langDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length <= 2, s"${d.getName}: ${files.length} files")
    }
  }

  test("bucketed tables co-locate the join: no Exchange on either side") {
    val wh = java.nio.file.Files.createTempDirectory("bucketed_wh").toString
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    Sink.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 8,
      path = Some(s"$wh/orders_b"))
    Sink.writeBucketed(lineitem, "lineitem_b", Seq("l_orderkey"), 8,
      path = Some(s"$wh/lineitem_b"))
    try {
      // at sf0.001 AQE would broadcast these tiny tables; the MERGE
      // hint forces the sort-merge path the layout exists for (at
      // fact×fact scale the planner picks it unhinted)
      val joined = spark.table("lineitem_b").hint("merge")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      // co-located: same bucket count on both join keys ⇒ the
      // SortMergeJoin reads bucket pairs directly — zero shuffle, and
      // the in-bucket sortBy elides the per-task sort
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"not a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join shuffled:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"buckets unused:\n$p")
      // row parity with the plain (shuffling) join
      val want = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == want && want > 0)
      // bucket pruning: an equality predicate on the bucket key scans
      // ONE bucket, not all 8. (autoBucketedScan skips the bucketed
      // layout when no join/agg needs the distribution — turn it off
      // so the pure-filter scan exercises the pruning path.)
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val one =
        try spark.table("orders_b").filter(col("o_orderkey") === 7L)
          .queryExecution.executedPlan.toString.replaceAll("\n", " ")
        finally spark.conf.unset(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled")
      assert(one.matches(".*SelectedBucketsCount: 1 out of 8.*"),
        s"no bucket pruning in:\n$one")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
