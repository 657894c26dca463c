package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence graph building + triangle counting — the
  * market-basket / graph-motif pair: which items appear together, and
  * how clustered is the resulting item graph.
  *
  * Scale shapes:
  *  - [[copairs]]: per-basket self-join on the basket key. The
  *    blow-up is C(basket size, 2) per basket — bounded by the
  *    largest basket, not the corpus — and the (i, j) pair counts
  *    come out of one map-side-combined shuffle; `minSupport` then
  *    shrinks the graph before anything quadratic-in-degree runs.
  *  - [[triangleCount]]: the classic (degree, id)-orientation scheme
  *    (Schank/Wagner '05): every edge points from its lower-ranked
  *    endpoint to the higher, so each wedge is generated exactly once
  *    at its lowest-ranked apex and the wedge count is bounded by
  *    Σ out-deg(v)² with out-degrees capped near √m — the bound that
  *    keeps power-law graphs (the co-purchase graph is one) from
  *    exploding the naive three-way join. Two equi-join shuffles
  *    total; counts are exact integers, so the result is
  *    engine-exact with no rounding contract needed.
  */
object GraphOps {

  /** Distinct co-occurring item pairs per basket with support count:
    * (i, j, n_baskets), i < j, support ≥ `minSupport`.
    */
  def copairs(items: DataFrame, basket: String, item: String,
              minSupport: Long): DataFrame = {
    val p = items.select(col(basket).as("_b"), col(item).as("_i"))
      .distinct()
    p.join(p.select(col("_b"), col("_i").as("_j")), Seq("_b"))
      .filter(col("_i") < col("_j"))
      .groupBy(col("_i").as("i"), col("_j").as("j"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }

  /** Exact triangle count of the undirected graph `edges` (i, j;
    * assumed canonical i < j, deduplicated). Returns one row:
    * (n_triangles).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val deg = edges
      .select(explode(array(col("i"), col("j"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val ranked = edges
      .join(deg.select(col("v").as("i"), col("d").as("di")), Seq("i"))
      .join(deg.select(col("v").as("j"), col("d").as("dj")), Seq("j"))
    val rI = struct(col("di").as("d"), col("i").as("v"))
    val rJ = struct(col("dj").as("d"), col("j").as("v"))
    val iLow = rI < rJ
    // src = lower-ranked endpoint; carry the dst's rank for the wedge order
    val oriented = ranked.select(
      when(iLow, col("i")).otherwise(col("j")).as("src"),
      when(iLow, col("j")).otherwise(col("i")).as("dst"),
      when(iLow, rJ).otherwise(rI).as("dstR"))
    val wedges = oriented.select(col("src"), col("dst").as("v1"),
        col("dstR").as("r1"))
      .join(oriented.select(col("src"), col("dst").as("v2"),
        col("dstR").as("r2")), Seq("src"))
      .filter(col("r1") < col("r2"))
    wedges.join(oriented.select(col("src").as("v1"), col("dst").as("v2")),
        Seq("v1", "v2"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
