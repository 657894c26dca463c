package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-robust equi-join by key salting.
  *
  * A shuffled equi-join sends every row of one key to one reducer: a
  * pathologically hot key (the "null user", the empty-string shingle,
  * the default session id) turns into one straggler task that can
  * exceed executor memory at 100 TB. AQE's skew-join splitting handles
  * moderate skew by splitting oversized PARTITIONS; explicit salting is
  * the guard for the single-oversized-KEY case AQE cannot split
  * (`spark.sql.adaptive.skewJoin` splits the left side's partitions but
  * each split still joins the full right-side key group).
  *
  * Shape: the big (skewed) side gets a content-derived salt in
  * [0, salts); the small side is replicated `salts`× (bounded: |right|
  * · salts rows); the join key becomes (key, salt), spreading the hot
  * key over `salts` reducers. Row-identical to the plain join for any
  * salt assignment — the salt only routes.
  */
object SkewJoin {

  /** Inner equi-join of a skewed `left` against a modest `right` on
    * `key`, spread over `salts` sub-keys. Result columns = left ++
    * right-minus-key, same as `left.join(right, Seq(key))`.
    */
  def salted(left: DataFrame, right: DataFrame, key: String,
             salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // content-derived (deterministic, partitioning-independent) salt;
    // uniformity only affects balance, never correctness
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
