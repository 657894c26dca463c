package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc diagnosis: does Bench's per-query unpersist sweep evict the
  * setup-level churn dataset cache? Prints persistent RDD ids around a
  * bench-shaped run of the churn-based queries.
  */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ids = spark.sparkContext.getPersistentRDDs.keySet.toSeq.sorted

    val t0 = System.nanoTime()
    graft.surv.ChurnView.dataset(spark, dir)
    println(f"SETUP ${(System.nanoTime() - t0) / 1e9}%.2f s ids=${ids.mkString(",")}")

    val setupIds = spark.sparkContext.getPersistentRDDs.keySet

    val names = SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      def once(): Double = {
        val t = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t) / 1e9
      }
      val c = once(); val w = once()
      val fresh = spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
      val lost = setupIds -- spark.sparkContext.getPersistentRDDs.keySet
      println(f"QUERY $name cold=$c%.2f warm=$w%.2f sweeping=${fresh.keySet.toSeq.sorted.mkString(",")} setupLost=${lost.toSeq.sorted.mkString(",")}")
      fresh.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
