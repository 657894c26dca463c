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
    // a pre-existing _salt column would be silently replaced by
    // withColumn and corrupt the join result — fail loudly instead
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "inputs must not already have a _salt column")
    // content-derived (deterministic, partitioning-independent) salt;
    // uniformity only affects balance, never correctness — the right
    // side is replicated to EVERY salt value, so any salt assignment
    // (even a non-deterministic one) yields the identical row set.
    // xxhash64 rejects map-typed columns, so hash only the hashable
    // ones; a (degenerate) all-map row falls back to a per-row id.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val hashCols = left.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val saltSrc = if (hashCols.nonEmpty) xxhash64(hashCols: _*)
                  else monotonically_increasing_id()
    val l = left.withColumn("_salt", pmod(saltSrc, lit(salts)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
