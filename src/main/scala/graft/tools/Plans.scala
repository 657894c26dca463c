package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for key queries (plan audit). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q_scan_filter_project", "q3_join", "q1_agg",
      "q_churn_view", "q_sim_topk", "q_dedup_minhash_lsh")
    interesting.foreach { name =>
      println(s"===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
