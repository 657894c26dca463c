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

  /** One loop over [[graft.functions.Registry.all]] — the same table
    * [[GraftExtensions]] injects, so the two SQL surfaces cannot drift.
    */
  def registerFunctions(spark: SparkSession): Unit =
    graft.functions.Registry.all.foreach { case (name, builder) =>
      bridge.registerFunction(spark, name, builder)
    }
}
