package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned semi-join — the runtime-filter pattern, hand-wired
  * from the same Catalyst machinery AQE's row-level runtime filtering
  * uses (`BloomFilterAggregate` / `BloomFilterMightContain`). The
  * selective dim side is folded into a fixed-size Bloom sketch (one
  * map-side-combined aggregation, ~numBits/8 bytes on the driver,
  * shipped to tasks as a literal); the fact side probes it IN THE
  * SCAN STAGE, so non-matching fact rows die before the join shuffle
  * instead of after it. At 100 TB this is the difference between
  * shuffling the full fact table and shuffling only the ~matching
  * fraction; the closing exact semi-join clears the Bloom's false
  * positives, so the RESULT is bit-identical to a plain left-semi
  * join (which is what the oracle checks).
  */
object BloomPrune {

  /** Exact left-semi join of `fact` against `dim` keys, Bloom-pruned
    * before the shuffle. `expectedItems`/`numBits` size the sketch
    * (defaults: 1 M keys at ~1 MiB ≈ 3% false-positive rate — false
    * positives cost only wasted shuffle rows, never wrong results).
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = 1000000L,
               numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bloomBin = dim.select(bridge.toColumn(
        BloomFilterAggregate(bridge.toExpression(xxhash64(col(dimKey))),
          Literal(expectedItems), Literal(numBits), 0, 0)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    // empty dim -> null sketch -> might_contain yields null -> filter
    // drops every row, matching the empty semi-join result
    val pruned = fact.filter(bridge.toColumn(
      BloomFilterMightContain(Literal(bloomBin, BinaryType),
        bridge.toExpression(xxhash64(col(factKey))))))
    // alias the dim key: with factKey == dimKey (the common case) an
    // unqualified equality predicate is AMBIGUOUS_REFERENCE
    val rk = s"__bp_$dimKey"
    pruned.join(dim.select(col(dimKey).as(rk)), col(factKey) === col(rk),
      "leftsemi")
  }
}
