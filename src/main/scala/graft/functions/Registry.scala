package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.bridge

/** The ONE table of SQL-registered engine expressions, consumed by
  * BOTH registration paths — [[graft.SqlViews.registerFunctions]] for
  * a live session and [[graft.GraftExtensions]] for
  * `--conf spark.sql.extensions` deployments — so the SQL surface can
  * never drift between them (two hand-maintained copies previously
  * could).
  *
  * Fixed-arity builders validate their argument count with a clear
  * AnalysisException: the bare `exprs(1)` style surfaced a missing
  * argument as an internal IndexOutOfBounds and SILENTLY DROPPED
  * extra arguments (`rolling_hash(text, 7)` computed with the default
  * base, no error). The variadic/validated builders (heavy_hitters,
  * top_k, hll_est, the normalizers) keep their own checks.
  */
object Registry {

  private def exact(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) bridge.analysisError(
        s"$name expects exactly $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> exact("rolling_hash", 1)(exprs =>
      RollingHash(exprs.head, RollingHash.DefaultBase,
        RollingHash.DefaultMod)),
    "vec_dot" -> exact("vec_dot", 2)(exprs =>
      VecDot(exprs.head, exprs(1))),
    // product() aggregate/window function, matching DuckDB's — usable
    // as `product(x) OVER (ORDER BY …)` for running products
    "product" -> exact("product", 1)(exprs =>
      ProductAgg(exprs.head).toAggregateExpression()),
    // heavy_hitters(col, k) Misra-Gries sketch aggregate; k must be a
    // foldable integer literal (validated — clear AnalysisException)
    "heavy_hitters" -> MisraGries.fromExprs,
    "top_k" -> TopKAgg.fromExprs,
    "nfc_normalize" -> UnicodeNormalize.fromExprs("NFC"),
    "nfkc_normalize" -> UnicodeNormalize.fromExprs("NFKC"),
    // hll_est(col, seed) HyperLogLog cardinality aggregate (4096-byte
    // mergeable register buffer; numerically identical to the
    // Sketches.hllEstimate dataflow)
    "hll_est" -> HllAgg.fromExprs)
}
