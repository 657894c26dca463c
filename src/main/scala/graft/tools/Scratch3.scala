package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: time named SparkEntry queries at a given
  * scale factor, cold + warm (not part of the driver contract).
  * Usage: runMain graft.tools.Scratch3 <sfDir> <query> [query ...]
  */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    try graft.surv.ChurnView.dataset(spark, dir)
    catch { case e: Throwable => System.err.println(s"setup: $e") }
    val setupIds = spark.sparkContext.getPersistentRDDs.keySet

    args.tail.foreach { name =>
      (1 to 2).foreach { i =>
        val before = spark.sparkContext.getPersistentRDDs.keySet ++ setupIds
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"TIMING $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => before(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
