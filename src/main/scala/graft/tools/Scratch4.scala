package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: per-Spark-job wall times for one query
  * (not part of the driver contract).
  * Usage: runMain graft.tools.Scratch4 <sfDir> <query>
  */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.get(je.jobId)).getOrElse(0L)
        println(f"  JOB ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    })
    val dir = args(0)
    graft.surv.ChurnView.dataset(spark, dir)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(args(1))(spark, dir).count()
      println(f"TOTAL run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
