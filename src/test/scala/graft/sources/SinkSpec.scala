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
}
