package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout:
  * interleave the bits of per-dimension bucket ranks into one sort
  * key, then range-partition + sort by it, so a file/partition covers
  * a compact hyper-rectangle of the key space and a scan with
  * predicates on ANY clustered dimension prunes most partitions (the
  * layout trick behind Delta/Iceberg OPTIMIZE ZORDER; the reference
  * has no layout story — ES handles placement server-side,
  * dataset.py:260).
  *
  * Everything is integer arithmetic on builtins (shift/and/sum), so
  * the key computation is scan-fused whole-stage codegen with exact
  * oracle parity; the clustering itself is ONE range exchange — the
  * same shuffle a plain global sort would pay.
  */
object ZOrder {

  /** Interleave `bits` low bits of each rank column: dimension 0
    * owns output bit positions 0, d, 2d, ...; dimension i is offset
    * by i. Ranks must be non-negative; callers bucket first
    * ([[bucketCol]]). d·bits must fit a long (≤ 63).
    */
  def mortonCol(ranks: Seq[Column], bits: Int): Column = {
    val d = ranks.size
    require(d * bits <= 63, s"$d dims x $bits bits overflow a long")
    val terms = for {
      (r, dim) <- ranks.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(r.cast("long"), i).bitwiseAND(lit(1L)),
      i * d + dim)
    terms.reduce(_ + _)
  }

  /** Value-order-preserving bucket rank in [0, 2^bits): linear map of
    * [mn, mx] onto the bucket range. All-long arithmetic with a true
    * integral divide (NOT double division, whose 2^53 mantissa a
    * micros-scale product overflows), so the rank is exact at any
    * span; mn/mx come from a prior stats pass or domain knowledge.
    */
  def bucketCol(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val span = (mx - mn + lit(1)).cast("long")
    val scaledUp = (c - mn).cast("long") * lit(1L << bits)
    org.apache.spark.sql.graft.bridge.toColumn(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.bridge.toExpression(scaledUp),
        org.apache.spark.sql.graft.bridge.toExpression(span)))
  }

  /** Zone-map (data-skipping stats) over a Z-keyed frame: one row per
    * zone of 2^zoneBits consecutive Morton cells, with per-dimension
    * min/max bounds and a row count — the manifest a scan planner
    * probes to skip zones whose bounds miss the predicate (parquet
    * row-group stats / Iceberg manifests, but layout-aligned). Because
    * the z-curve keeps a zone inside a compact hyper-rectangle,
    * bounds on EVERY interleaved dimension stay tight, so predicates
    * on any of them prune. ONE shuffle, keyed on zone id.
    */
  def zoneMap(df: DataFrame, zkey: Column, dims: Seq[String],
              zoneBits: Int): DataFrame =
    df.groupBy(shiftrightunsigned(zkey.cast("long"), zoneBits).as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        dims.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))): _*)

  /** Cluster `df` into `numPartitions` Z-ordered partitions on the
    * given (already-bucketed) rank columns: one range exchange on the
    * Morton key + in-partition sort. Downstream writes inherit the
    * layout (each output file = a compact z-range).
    */
  def cluster(df: DataFrame, ranks: Seq[Column], bits: Int,
              numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("_zkey", mortonCol(ranks, bits))
    keyed.repartitionByRange(numPartitions, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }
}
