package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does Bench's `_setup` wall-clock go? Times the ChurnView
  * dataset build twice — once in the cold JVM, once on a fresh
  * session in the now-warm JVM — splitting codegen/JIT/footer warmup
  * (unavoidable, amortized across the whole bench) from real dataflow
  * cost (worth optimizing). Usage: runMain graft.tools.SetupProfile <sfDir>
  */
object SetupProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"SETUP $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    val dir = args(0)
    time("cold-jvm dataset") {
      graft.surv.ChurnView.dataset(spark, dir).train.count()
    }
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "UTC")
    time("warm-jvm dataset (fresh session, cold cache)") {
      graft.surv.ChurnView.dataset(s2, dir).train.count()
    }
    // sub-step breakdown on a third session
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.session.timeZone", "UTC")
    val churn = time("  build churn frame (lazy)") {
      graft.surv.ChurnView.build(s3, dir)
    }
    time("  churn count (materialize joins)") { churn.count() }
    val (withRn, n) = time("  StableOrder.withRowNumber") {
      graft.core.StableOrder.withRowNumber(churn,
        Seq(org.apache.spark.sql.functions.col("id")))
    }
    println(s"SETUP   rows=$n")
    time("  OneHotSpec.fitAll") {
      graft.surv.OneHotSpec.fitAll(withRn, Seq("c_mktsegment", "n_name"))
    }
    spark.stop()
  }
}
