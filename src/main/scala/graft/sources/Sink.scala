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
}
