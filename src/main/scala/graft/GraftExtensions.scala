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

  override def apply(ext: SparkSessionExtensions): Unit =
    // one loop over the shared table SqlViews.registerFunctions also
    // consumes — the two SQL surfaces cannot drift
    functions.Registry.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Registry", name), builder))
    }
}
