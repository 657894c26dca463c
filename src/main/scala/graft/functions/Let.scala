package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Let-binding for Column expression trees.
  *
  * Composing array expressions through plain `val`s duplicates the
  * bound SUBTREE at every reference site (Catalyst expressions are
  * trees, not DAGs): e.g. a softmax built as `transform(ex, v => v /
  * aggregate(ex, …))` re-embeds the whole `ex` tree — and everything
  * under it — once per element, and higher-order functions are
  * interpreted (no whole-stage codegen), so the duplicated work is
  * paid at RUNTIME per row, O(K²)-fold for a K-stage pipeline.
  *
  * `bind` evaluates `v` ONCE per row by wrapping it as a one-element
  * array and passing the lambda variable into `body` — the Catalyst
  * analog of a `let`: references to the variable are O(1) lambda-var
  * reads, not subtree copies.
  */
object Let {
  def bind(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)
}
