package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time("shingles count") {
      Dedup.shingles(docs, "doc_id", "text").count()
    }
    // piecewise replication of minhashLshPairs
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signature materialize") {
      Dedup.minhashSignatureArr(sh, 16).count()
    }
    val sig = Dedup.minhashSignatureArr(sh, 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sh materialize") { sh.count() }
    time("sig materialize") { sig.count() }
    val bands = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(1)), b =>
        concat_ws(",", transform(
          slice(col("sig"), b * 8 + lit(1), lit(8)),
          _.cast("string"))))).as(Seq("band", "key")))
    time("bands count") { bands.count() }
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cand count") { println(cand.count()) }
    val est = cand
      .join(sig.select(col("id").as("i"), col("sig").as("sa")), Seq("i"))
      .join(sig.select(col("id").as("j"), col("sig").as("sb")), Seq("j"))
      .select(col("i"), col("j"),
        (aggregate(zip_with(col("sa"), col("sb"),
          (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(16.0)).as("est"))
    time("est count") { est.count() }
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("id").as("i"), col("sh").as("sha")), Seq("i"))
      .join(sh.select(col("id").as("j"), col("sh").as("shb")), Seq("j"))
      .filter(col("sha") === col("shb"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
    time("inter count") { inter.count() }
    time("full lsh pairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 8, 3).count()
    }
    spark.stop()
  }
}
