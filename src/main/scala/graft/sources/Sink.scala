package graft.sources

import org.apache.spark.sql.DataFrame

/** Partitioned parquet sink — the write side of a 100-TB corpus
  * pipeline (the reference's only sink is the eland round-trip;
  * SURVEY §2.1 S4). Two scale behaviors a naive `write.parquet`
  * misses:
  *
  *  - **partition layout**: `partitionBy(cols)` lays the corpus out
  *    hive-style (`lang=en/…`), so downstream readers with a
  *    partition-column predicate scan only matching directories
  *    (PartitionFilters in the plan — asserted in SinkSpec, not just
  *    claimed);
  *  - **file sizing**: one output file per (task × partition-value)
  *    is the small-files failure mode at 1000 executors; repartition
  *    on the partition columns + a salt bounded by `filesPerValue`
  *    gives ≤ filesPerValue files per value, each fed by exactly one
  *    task (no tiny-file spray, no single-task hot value).
  */
object Sink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerValue: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
    require(partitionCols.nonEmpty && filesPerValue > 0)
    val salted = df.withColumn("_file_salt",
      pmod(xxhash64(partitionCols.map(col): _*) + spark_partition_id(),
        lit(filesPerValue.toLong)))
    salted
      .repartition((partitionCols :+ "_file_salt").map(col): _*)
      .drop("_file_salt")
      .write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)
  }

  /** Bucketed (hash-clustered) table write — the CO-LOCATED-JOIN
    * layout for fact tables that join on the same key repeatedly
    * (orders ⋈ lineitem on the order key at every SF). Both sides
    * written with the SAME bucket count on their join keys make the
    * join shuffle-FREE: each bucket file pair joins locally, so a
    * 100-TB fact⋈fact pays zero exchange on its hottest key
    * (SortMergeJoin with no Exchange on either side — asserted on the
    * physical plan in SinkSpec, not just claimed). `sortCols`
    * (default: the bucket keys) pre-sorts within buckets, eliding the
    * per-task sort too.
    *
    * Requires a table name (bucket metadata lives in the catalog, not
    * the parquet footer); `spark.conf spark.sql.sources.
    * bucketing.enabled` (default true) governs whether readers use it.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int,
                    sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty && numBuckets > 0)
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    val w = df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
      .format("parquet")
    // explicit location = external table (the warehouse dir is a
    // STATIC conf; callers without a configured warehouse pass a path)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
