package graft

import graft.core.Tables
import graft.functions.{RollingHash, VecDot}
import graft.surv.ChurnView
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.bridge

/** SQL-surface registration: temp views for every testdata table (plus
  * the churn survival view) and the engine's custom expressions as SQL
  * functions — so `spark.sql("SELECT rolling_hash(text) FROM
  * documents")` works exactly like the DataFrame API.
  */
object SqlViews {

  def register(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    ChurnView.build(spark, dir).createOrReplaceTempView("churn")
    registerFunctions(spark)
  }

  def registerFunctions(spark: SparkSession): Unit = {
    bridge.registerFunction(spark, "rolling_hash", exprs =>
      functions.RollingHash(exprs.head, RollingHash.DefaultBase,
        RollingHash.DefaultMod))
    bridge.registerFunction(spark, "vec_dot", exprs =>
      functions.VecDot(exprs.head, exprs(1)))
    // product() aggregate/window function, matching DuckDB's — usable
    // as `product(x) OVER (ORDER BY …)` for running products
    bridge.registerFunction(spark, "product", exprs =>
      functions.ProductAgg(exprs.head).toAggregateExpression())
    // heavy_hitters(col, k) Misra-Gries sketch aggregate; k must be a
    // foldable integer literal (validated — clear AnalysisException)
    bridge.registerFunction(spark, "heavy_hitters",
      functions.MisraGries.fromExprs)
    bridge.registerFunction(spark, "top_k", functions.TopKAgg.fromExprs)
    bridge.registerFunction(spark, "nfc_normalize",
      functions.UnicodeNormalize.fromExprs("NFC"))
    bridge.registerFunction(spark, "nfkc_normalize",
      functions.UnicodeNormalize.fromExprs("NFKC"))
    // hll_est(col, seed) HyperLogLog cardinality aggregate (4096-byte
    // mergeable register buffer; numerically identical to the
    // Sketches.hllEstimate dataflow)
    bridge.registerFunction(spark, "hll_est", functions.HllAgg.fromExprs)
  }
}
