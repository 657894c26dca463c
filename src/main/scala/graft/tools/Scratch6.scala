package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round CC loop timing probe (dev utility). */
object Scratch6 {
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
      println(f"S6 $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { run =>
      if (run == 3) spark.conf.set("spark.sql.shuffle.partitions", "4")
      val docs = graft.core.Tables.load(spark, dir, "documents")
      val edges0 = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJac = 0.05, maxDocFreq = 100).select(col("i"), col("j"))
      val e = t(s"r$run edges")(edges0.localCheckpoint(true))
      val undBoth = e.select(col("i").as("node"), col("j").as("nbr"))
        .union(e.select(col("j").as("node"), col("i").as("nbr")))
      var labels = t(s"r$run init")(undBoth.groupBy(col("node"))
        .agg(min(col("nbr")).as("nm"))
        .select(col("node"), least(col("node"), col("nm")).as("comp"))
        .localCheckpoint(true))
      var it = 0
      var converged = false
      while (!converged && it < 25) {
        val changed = t(s"r$run round$it") {
          val viaNbr = undBoth
            .join(labels.select(col("node").as("nbr"), col("comp")), Seq("nbr"))
            .groupBy(col("node")).agg(min(col("comp")).as("nbrMin"))
          val prop = labels.join(viaNbr, Seq("node"), "left")
            .select(col("node"), col("comp").as("prev"),
              least(col("comp"), coalesce(col("nbrMin"), col("comp"))).as("comp"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val next = prop
            .join(prop.select(col("node").as("comp"), col("comp").as("cc")),
              Seq("comp"))
            .select(col("node"), col("prev"), col("cc").as("comp"))
            .localCheckpoint(false)
          val ch = next.filter(col("comp") =!= col("prev")).count()
          prop.unpersist(false)
          labels = next.select(col("node"), col("comp"))
          ch
        }
        println(s"S6 r$run round$it changed=$changed")
        converged = changed == 0
        it += 1
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
