package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard Spark extension entry point: makes the engine's custom
  * Catalyst expressions available as SQL functions in ANY session via
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (the same wiring `SqlViews.registerFunctions` does imperatively for
  * an already-running session). Injected at session-state build time,
  * so the functions exist in every session derived from the config —
  * no library call required; this is how a cluster operator would
  * deploy the engine jar.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def fn(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    fn("rolling_hash", exprs =>
      functions.RollingHash(exprs.head, functions.RollingHash.DefaultBase,
        functions.RollingHash.DefaultMod))
    fn("vec_dot", exprs => functions.VecDot(exprs.head, exprs(1)))
    fn("product", exprs =>
      functions.ProductAgg(exprs.head).toAggregateExpression())
    fn("heavy_hitters", functions.MisraGries.fromExprs)
    fn("top_k", functions.TopKAgg.fromExprs)
    fn("nfc_normalize", functions.UnicodeNormalize.fromExprs("NFC"))
    fn("nfkc_normalize", functions.UnicodeNormalize.fromExprs("NFKC"))
    fn("hll_est", functions.HllAgg.fromExprs)
  }
}
