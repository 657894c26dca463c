package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of the bench's _setup (ChurnView.dataset):
  * what share is JVM/codegen warmup vs the churn build vs the
  * StableOrder pass vs encoder fits.
  */
object Scratch7 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch7] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    t("warmup count(lineitem)") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    }
    val churn = t("churn build+count") {
      val df = graft.surv.ChurnView.build(spark, sfDir)
      df.count(); df
    }
    t("dataset (StableOrder+encoders)") {
      graft.surv.ChurnView.dataset(spark, sfDir)
    }
    t("dataset second call (memoized)") {
      graft.surv.ChurnView.dataset(spark, sfDir)
    }
    spark.stop()
  }
}
