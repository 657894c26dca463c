package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The materialized-rn ingest layout (StableOrder.materializeRowNumber
  * — the 100-TB split path): proves the PROPERTIES that make a split
  * filter prune row groups, not just that results match.
  *
  *  - layout: every parquet row group's rn min/max stats are TIGHT
  *    (max − min + 1 == rowCount: the group covers a contiguous rn
  *    range exactly) and globally DISJOINT, with at least one file
  *    holding several row groups (so the pin isn't vacuously about
  *    file-level stats);
  *  - pushdown: the split predicate reaches the parquet scan as a
  *    PushedFilter on rn.
  *
  * Tight disjoint stats + a pushed range predicate IS row-group
  * pruning: the reader drops every group whose [min,max] misses the
  * predicate before decoding a page. The result-level equivalence of
  * the layout is gate-checked (q_split_train_mat/q_split_test_mat
  * share the on-the-fly twins' oracles).
  */
class StableOrderIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("materialized rn layout: tight disjoint row-group stats, " +
    "pushed-down split filter, numbering identical to on-the-fly") {
    val n = 60000L
    // keys deliberately NOT in input order: zero-padded string key so
    // lexicographic key order == id order, but rows arrive shuffled
    val df = spark.range(n).select(
      concat(lit("k"), lpad(col("id").cast("string"), 8, "0")).as("key"),
      (col("id") * 37 % 1000).as("payload"))
      .repartition(8) // destroy input ordering
    val base = java.nio.file.Files.createTempDirectory("graft_rnmat_spec_")
    val path = s"$base/t"
    try {
      val total = StableOrder.materializeRowNumber(df, Seq(col("key")), path,
        numPartitions = 4,
        // tiny row groups: force several per file so the stats pin is
        // genuinely about ROW-GROUP pruning, not one-group files
        writerOptions = Map("parquet.block.size" -> (64 * 1024).toString))
      assert(total == n)

      // ---- layout: footer row-group statistics on rn ----
      val conf = spark.sparkContext.hadoopConfiguration
      val dirPath = new org.apache.hadoop.fs.Path(path)
      val fs = dirPath.getFileSystem(conf)
      val files = fs.listStatus(dirPath)
        .filter(_.getPath.getName.endsWith(".parquet")).toSeq
      assert(files.nonEmpty, "no parquet files written")
      val perFile: Seq[Seq[(Long, Long, Long)]] = files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(f.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == StableOrder.RN)
            .getOrElse(fail(s"no rn column chunk in ${f.getPath}"))
          val st: org.apache.parquet.column.statistics.Statistics[_] =
            c.getStatistics
          assert(st != null && !st.isEmpty && st.getNumNulls == 0,
            s"rn stats missing in ${f.getPath} — nothing to prune on")
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue(),
            b.getRowCount)
        } finally r.close()
      }
      // several row groups in at least one file (64 KB blocks over
      // ~15k-row partitions guarantee it; if parquet ever ignores the
      // size hint this pin fails loudly instead of passing vacuously)
      assert(perFile.exists(_.size >= 2),
        s"every file has one row group (${perFile.map(_.size)}) — " +
          "the multi-group pruning pin is vacuous")
      val groups = perFile.flatten.sortBy(_._1)
      // TIGHT: each group's stats bound a contiguous rn run exactly
      groups.foreach { case (mn, mx, rows) =>
        assert(mx - mn + 1 == rows,
          s"row group [$mn,$mx] has $rows rows — stats not tight")
      }
      // DISJOINT + complete: groups tile [0, n) with no overlap
      assert(groups.head._1 == 0L && groups.last._2 == n - 1)
      groups.sliding(2).foreach {
        case Seq((_, mx1, _), (mn2, _, _)) =>
          assert(mn2 == mx1 + 1, s"row groups overlap/gap at $mx1 -> $mn2")
        case _ => ()
      }

      // ---- pushdown: the split predicate reaches the scan ----
      val back = spark.read.parquet(path)
      val trainLen = (total * 0.9).toLong
      val split = back.filter(col(StableOrder.RN) < trainLen)
      val plan = split.queryExecution.executedPlan.toString
      assert(plan.contains(s"LessThan(rn,$trainLen)"),
        s"rn split filter not pushed to the parquet scan:\n$plan")
      assert(split.count() == trainLen)

      // ---- numbering identical to the on-the-fly path ----
      Pins.scoped {
        val (fly, flyTotal) = StableOrder.withRowNumber(df, Seq(col("key")), 4)
        assert(flyTotal == total)
        val mismatch = back.select(col("key"), col(StableOrder.RN))
          .join(fly.select(col("key"), col(StableOrder.RN).as("rn_fly")),
            "key")
          .filter(col(StableOrder.RN) =!= col("rn_fly")).count()
        assert(mismatch == 0, s"$mismatch rows numbered differently")
      }
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val walk = Files.walk(base)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("materializeRowNumber on an EMPTY frame writes a readable " +
    "zero-row layout (the ingest-of-nothing edge)") {
    // an empty source partition set must not break the counts pass,
    // the offsets array, or the written footer — a pipeline that
    // filters everything upstream still needs its ingest step to
    // succeed and its splits to return empty, not throw
    val df = spark.range(0).select(
      concat(lit("k"), col("id").cast("string")).as("key"),
      col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_rnmat_empty_")
    try {
      val total = StableOrder.materializeRowNumber(
        df, Seq(org.apache.spark.sql.functions.col("key")), s"$base/t",
        numPartitions = 4)
      assert(total == 0L)
      val back = spark.read.parquet(s"$base/t")
      assert(back.count() == 0L)
      assert(back.filter(col(StableOrder.RN) < 100L).count() == 0L)
      assert(back.columns.contains(StableOrder.RN))
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val walk = Files.walk(base)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
