package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: per-job wall times of the shared dataset
  * setup (not part of the driver contract).
  */
object Scratch5 {
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
    val t0 = System.nanoTime()
    graft.surv.ChurnView.dataset(spark, args(0))
    println(f"SETUP ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
