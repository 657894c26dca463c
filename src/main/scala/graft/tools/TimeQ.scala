package graft.tools
import org.apache.spark.sql.SparkSession
/** Time one or more SparkEntry queries: cold + two warm runs each,
  * mirroring the bench methodology, without the 75-query overhead.
  * Usage: runMain graft.tools.TimeQ <sfDir> <query> [query ...]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same pre-scope setup as Bench: the shared churn dataset's pins
    // must predate the per-query Pins scopes (otherwise the first
    // churn-backed query pays the build in its cold number AND the
    // scope sweep unpins the memoized dataset for every later query)
    try graft.surv.ChurnView.dataset(spark, args(0))
    catch { case e: Throwable => System.err.println(s"[timeq] setup: $e") }
    args.drop(1).foreach { q =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      def once(): Double = {
        val t0 = System.nanoTime()
        // full-plan execution, not count() — see Bench.once
        graft.SparkEntry.queries(q)(spark, args(0))
          .queryExecution.executedPlan.execute().count()
        (System.nanoTime() - t0) / 1e9
      }
      // Pins.scoped mirrors Bench: Dataset-level release so the next
      // query's persist of the same canonical plan still caches.
      val (c, w) = graft.core.Pins.scoped {
        val c0 = once(); (c0, math.min(once(), once()))
      }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = true))
      println(f"TIMEQ $q cold=$c%.2f warm=$w%.2f")
    }
    spark.stop()
  }
}
