package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Attach a DRIVER-BOUNDED relation to every row of `left` — the
  * genuine small-cartesian expansion (e.g. subjects × a data-derived
  * ≤100-row baseline-hazard grid).
  *
  * This IS `crossJoin(broadcast(right))` (a constant join key would
  * fold back to a cross join under FoldablePropagation anyway); its
  * value is the call-site contract: `attach` asserts the build side
  * is bounded by construction, so a plan audit can treat any OTHER
  * BroadcastNestedLoopJoin as a scale bug. Before reaching for it,
  * prefer (a) `Dataset.scalar()` — a scalar subquery, no join at all
  * — for 1-row aggregates, and (b) `posexplode(lit(arr))` for
  * driver-known grids; attach is for small DATA-DERIVED relations
  * only.
  */
object Attach {

  def apply(left: DataFrame, right: DataFrame): DataFrame =
    left.crossJoin(broadcast(right))

  /** Enrichment syntax: `df.attach(scalars)`. */
  implicit class AttachOps(private val left: DataFrame) extends AnyVal {
    def attach(right: DataFrame): DataFrame = Attach(left, right)
  }
}
