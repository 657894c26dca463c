package graft.tools

import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main: the exact bench-shaped minhash-LSH call,
  * cold then warm, in a fresh JVM (not part of the driver contract).
  */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { i =>
      time(s"bench-shaped lsh run$i") {
        Dedup.minhashLshPairs(Tables.load(spark, dir, "documents"),
          "doc_id", "text", numHashes = 16, rowsPerBand = 8, n = 3)
          .orderBy("i", "j").count()
      }
    }
    spark.stop()
  }
}
