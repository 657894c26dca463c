package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter ingest gate — incremental dedup of a NEW batch against
  * a corpus-sized "seen" key set without ever joining the corpus
  * per-ingest (the snapshot-over-snapshot flavor of the dedup family:
  * exact/minhash dedup handle WITHIN-corpus duplicates, the gate
  * handles batch-vs-100-TB-history).
  *
  * Built on Spark's own runtime-filter machinery (the
  * `BloomFilterAggregate` / `BloomFilterMightContain` expression pair
  * that powers AQE's injected runtime filters — mergeable
  * task-local sketches, codegen membership probe), so the probe runs
  * inside whole-stage codegen, not a UDF.
  *
  * Scale shape, two-phase:
  *  1. `mightContain` splits the batch row-locally: NOT-contained
  *     rows are DEFINITELY new (Bloom filters have no false
  *     negatives) and pass with zero join work;
  *  2. only the "maybe seen" sliver — |truly-seen ∩ batch| plus the
  *     fpp tail — needs exact confirmation, and it is small enough to
  *     BROADCAST: the corpus is semi-joined against the broadcast
  *     maybe-keys (a scan + broadcast probe, never a corpus shuffle),
  *     and the confirmed keys broadcast back as an anti-join.
  *
  * The two-phase output is EXACTLY the truly-new rows — the fpp only
  * moves work between phases, never rows out of the result — which is
  * what makes the gate oracle-checkable (q_bloom_decontam's DuckDB
  * twin is a plain anti-join).
  */
object BloomGate {

  /** Serialized Bloom filter of xxhash64(`key`) over `corpus` —
    * built distributed (one mergeable sketch per task), collected as
    * one `numBits/8`-byte array. Size it like Spark's runtime
    * filters: numBits ≈ items × ln(1/fpp) × 1.44; 8 bits/item ≈ 2%.
    */
  def buildFilter(corpus: DataFrame, key: String,
                  expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(bridge.toExpression(col(key)))),
      Literal(expectedItems), Literal(numBits))
    corpus.select(bridge.toColumn(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Row-local membership probe (no false negatives; false positives
    * at the filter's fpp). Null keys probe as null → treated unseen.
    */
  def mightContain(key: Column, filter: Array[Byte]): Column =
    bridge.toColumn(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(bridge.toExpression(key)))))

  /** Truly-new rows of `batch` w.r.t. `corpus` on `key`, exact.
    * Builds the filter (one full corpus aggregation scan) then
    * delegates to the prebuilt-filter overload (one more corpus scan
    * for the confirmation probe) — two corpus scans total for a
    * one-shot call. Repeated ingests should [[buildFilter]] ONCE,
    * store the bytes next to the corpus snapshot, and call the
    * overload: steady-state cost is then a single corpus scan per
    * ingest, and only for the confirmation probe.
    */
  def decontaminate(batch: DataFrame, corpus: DataFrame, key: String,
                    expectedItems: Long, numBits: Long): DataFrame =
    decontaminate(batch, corpus, key,
      buildFilter(corpus, key, expectedItems, numBits))

  /** The prebuilt-filter flavor: ONE corpus scan (the confirmation
    * semi probe) + two broadcast probes; phase-2 candidates must fit
    * a broadcast — guaranteed when the batch is ingest-sized, the
    * regime the gate exists for. The flagged batch is pinned
    * (caller's cache scope releases it) so the probe evaluates once,
    * not once per consumer branch.
    */
  def decontaminate(batch: DataFrame, corpus: DataFrame, key: String,
                    filter: Array[Byte]): DataFrame = {
    val flagged = graft.core.Pins.pin(batch.withColumn("_maybe",
      coalesce(mightContain(col(key), filter), lit(false))))
    val definitelyNew = flagged.filter(!col("_maybe")).drop("_maybe")
    val maybe = flagged.filter(col("_maybe")).drop("_maybe")
    val maybeKeys = maybe.select(col(key)).distinct()
    // corpus-side confirmation: scan + broadcast semi probe (the ONLY
    // corpus touch), then the confirmed keys broadcast back
    val confirmed = corpus.select(col(key))
      .join(broadcast(maybeKeys), Seq(key), "left_semi").distinct()
    val rescued = maybe.join(broadcast(confirmed), Seq(key), "left_anti")
    definitelyNew.unionByName(rescued)
  }
}
