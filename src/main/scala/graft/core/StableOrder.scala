package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable, scalable row numbering.
  *
  * The reference's core "query" pattern is ordered positional slicing —
  * head/tail train/test splits and cursor-paged batch windows
  * (reference: src/elastic_surv/dataset.py:64-68,189-225). Spark
  * DataFrames have no inherent row order, so the engine imposes a total
  * order via a caller-named unique key.
  *
  * A naive `row_number().over(Window.orderBy(key))` collapses to a
  * single partition — the classic scalability trap. This is the
  * distributed two-pass scheme instead:
  *
  *   1. range-partition + sort by the key (one shuffle, stays sorted);
  *   2. count rows per partition (tiny job; ≤ numPartitions rows to the
  *      driver) → running offsets;
  *   3. rn = offset(pid) + row_number() windowed BY partition id — every
  *      partition numbers itself in parallel.
  *
  * At 100 TB the preferred variant is materializing `rn` once at ingest
  * (then splits become data filters with parquet min/max row-group
  * pruning); this two-pass form is the on-the-fly fallback and is what
  * the oracle checks (it equals `row_number() OVER (ORDER BY key) - 1`).
  */
object StableOrder {
  val RN = "rn"

  /** Returns (df ⊕ rn, totalRowCount). Keys must form a total order
    * (unique); ties would make rn nondeterministic.
    */
  def withRowNumber(df: DataFrame, keys: Seq[Column],
                    numPartitions: Int = 0): (DataFrame, Long) = {
    val np =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // persist: RangePartitioner samples its boundaries with a seed
    // derived from the RDD id, so two *separate executions* of this
    // plan (the counts pass below vs. downstream queries) could see
    // different partitionings — numbering would then be wrong. Caching
    // pins one physical partitioning for both passes. (At 100 TB you
    // don't do this on the fly at all: materialize rn once at ingest.)
    // Pins.pin: ownership-aware (two stable orders over the SAME
    // canonical plan share the one cached partitioning — a raw second
    // persist would warn + no-op) AND scope-registered, so an
    // enclosing CacheScope releases it at the DATASET level. The old
    // acquire-and-drop-the-flag shape left the pin releasable only by
    // the raw-RDD fallback sweep, whose dead CacheManager entry
    // poisons any later persist of the same plan (Pins scaladoc).
    val sorted = Pins.pin(df
      .repartitionByRange(np, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_pid", spark_partition_id()))
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // Per-partition offset as an O(1) literal-ARRAY lookup on _pid —
    // NOT a per-pid CASE WHEN chain. The retired foldLeft(when…)
    // built a nested CaseWhen one branch DEEP PER PARTITION, evaluated
    // per row (and duplicated per rn reference after predicate
    // pushdown): O(width) per row — measured as q_pair_rank burning
    // 2300 execCpu-s at width 128 / sf10 (vs 26 at width 32), and at
    // cluster widths (10³–10⁴ reducers) the expression tree itself
    // would stop analyzing. Missing pids (empty partitions) get their
    // running offset so the dense array indexes by pid directly;
    // CreateArray of foldable literals constant-folds to one Literal,
    // so the per-row work is a single array index.
    // WIDTH BOUND: the literal array is O(numPartitions) PLAN payload,
    // duplicated per rn reference until constant-folding collapses it
    // — negligible at the 10³–10⁴ reducer widths measured, but at
    // ingest-scale widths (10⁵+) plan size and the counts collect
    // grow linearly with width. That regime is exactly where the
    // documented 100-TB path applies: materialize rn ONCE at ingest
    // (object scaladoc) instead of numbering on the fly; past that, a
    // broadcast _pid→offset map join is the fallback.
    val byPid = counts.toMap
    val dense = (0 until np).map(p => byPid.getOrElse(p, 0L))
    val offsets = dense.scanLeft(0L)(_ + _).init
    val offCol = element_at(
      array(offsets.map(lit(_)): _*), col("_pid") + 1)
    val w = Window.partitionBy(col("_pid")).orderBy(keys: _*)
    val out = sorted
      .withColumn(RN, offCol + row_number().over(w).cast("long") - 1L)
      .drop("_pid")
    (out, counts.map(_._2).sum)
  }

  /** Materialize `rn` ONCE at ingest — the 100-TB path the object
    * scaladoc prescribes, as executable code. Numbers `df` with
    * [[withRowNumber]] and writes the result to parquet at `path`;
    * returns the total row count (callers derive split bounds from
    * it, e.g. trainLen = ⌊n·ratio⌋).
    *
    * Why the LAYOUT makes splits cheap: the numbered frame is
    * range-partitioned by the keys and sorted within partitions, and
    * rn is monotone in key order — so each output file covers a
    * contiguous rn range, internally sorted, and every parquet row
    * group's rn min/max stats are TIGHT and DISJOINT. A downstream
    * split or batch window (`rn < n`, `rn BETWEEN a AND b`) is then a
    * plain pushed-down data filter that prunes whole row groups (and
    * files) at scan time — no shuffle, no window, no counts job, at
    * any corpus size. This also retires [[withRowNumber]]'s two
    * width-bound caveats (the O(width) literal-array plan payload and
    * the counts collect): both are paid once at ingest, never at
    * query time.
    *
    * `writerOptions` pass through to the parquet writer (specs size
    * `parquet.block.size` down to force multi-row-group files; callers
    * at scale can bound `maxRecordsPerFile`).
    */
  def materializeRowNumber(df: DataFrame, keys: Seq[Column], path: String,
                           numPartitions: Int = 0,
                           writerOptions: Map[String, String] = Map.empty): Long =
    Pins.scoped {
      // scoped: withRowNumber's partitioning pin is fully consumed by
      // the write below, so its cache entry is released on exit
      val (out, total) = withRowNumber(df, keys, numPartitions)
      out.write.mode("overwrite").options(writerOptions).parquet(path)
      total
    }
}
