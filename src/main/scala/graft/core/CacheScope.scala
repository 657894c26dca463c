package graft.core

import org.apache.spark.sql.SparkSession

/** Scoped release of operator cache pins.
  *
  * Several operators persist load-bearing intermediates (shingle sets,
  * minhash signatures, LSH candidates, fitted baselines): the pin is
  * what keeps a multi-branch plan from recomputing its shared prefix,
  * but Spark has no plan-level lifecycle, so in a long session the pins
  * accumulate (the round-2 bench regression was exactly this — a block
  * manager full of dead cache). Verify and Bench sweep per query;
  * library callers get the same contract here:
  *
  * {{{
  * val pairs = CacheScope(spark) {
  *   Dedup.minhashLshPairs(docs, "doc_id", "text").collect()
  * }
  * }}}
  *
  * Everything persisted DURING the scope is unpersisted on exit —
  * consume (collect/write/count) the result inside the scope; a lazily
  * held DataFrame remains valid afterwards but recomputes. Pre-existing
  * pins (e.g. the memoized churn dataset) are untouched.
  *
  * Release happens at the DATASET level via [[Pins]] — a raw
  * `RDD.unpersist` sweep would leave the dead CacheManager entry that
  * silently disables any later `.persist()` of the same canonical plan
  * (see Pins' scaladoc for the measured failure). A `getPersistentRDDs`
  * diff remains as a fallback for persists that bypassed [[Pins]];
  * after the scoped release it normally matches nothing.
  */
object CacheScope {
  def apply[T](spark: SparkSession)(f: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try Pins.scoped(f)
    finally spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }
      .values.foreach(_.unpersist(blocking = false))
  }
}
