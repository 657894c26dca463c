package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    (1 to 2).foreach { run =>
      val docs = graft.core.Tables.load(spark, dir, "documents")
      val edges = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJac = 0.05, maxDocFreq = 100).select(col("i"), col("j"))
      val e = t(s"run$run edges-materialize")(edges.localCheckpoint(true))
      t(s"run$run cc-loop")(
        graft.ops.Dedup.connectedComponents(e).count())
      t(s"run$run cc-full")(
        graft.ops.Dedup.connectedComponents(edges).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
