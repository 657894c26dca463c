package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals needed to expose custom
  * Catalyst expressions as user-facing Columns (the standard
  * Spark-extension packaging technique: a tiny shim compiled into the
  * org.apache.spark.sql namespace).
  */
object bridge {
  /** private[sql] type surfaced for expressions outside the sql pkg. */
  type SqlAbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom expression as a SQL-callable function. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Whether `ds`'s canonical plan already has a CacheManager entry
    * (live or being built). Used by graft.core.Pins to make pin()
    * idempotent: a second persist of an already-cached plan would log
    * "Asked to cache already cached data" and silently no-op, leaving
    * two owners believing they hold the release.
    */
  def isCached(ds: org.apache.spark.sql.Dataset[_]): Boolean = {
    val d = ds.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    d.sparkSession.sharedState.cacheManager.lookupCachedData(d).isDefined
  }

  /** Re-bind a dataset's PHYSICAL rows into another session of the
    * same SparkContext: the source's executed RDD (for an eagerly
    * checkpointed dataset, a scan of its cached blocks — zero
    * recompute) becomes a LogicalRDD leaf in `target`. Used by
    * iterative operators that right-size their loop's shuffle width on
    * an isolated `newSession()` clone instead of mutating the shared
    * session conf: the clone shares context, cache, and checkpoint
    * blocks, but its `spark.sql.shuffle.partitions` is its own.
    */
  def rebind(target: org.apache.spark.sql.SparkSession,
             ds: org.apache.spark.sql.Dataset[_]): org.apache.spark.sql.DataFrame = {
    val c = ds.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    target.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(c.queryExecution.toRdd, c.schema)
  }

  /** Block until the async listener bus has dispatched every queued
    * event. SparkListener delivery is asynchronous even in local mode,
    * so task-metrics deltas snapped right after an action returns can
    * miss tail onTaskEnd events (they would then bleed into the NEXT
    * run's window). Measurement tools drain before snapping.
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Raise a user-facing AnalysisException from a function builder —
    * bad SQL arguments should fail analysis with a readable message,
    * not surface as IndexOutOfBounds/ClassCast from planner internals.
    */
  def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> msg))
}
