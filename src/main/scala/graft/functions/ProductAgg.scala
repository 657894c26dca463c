package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, IsNull, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Running product aggregate — the O(1)-per-row replacement for the
  * `aggregate(collect_list(factor) OVER w, 1.0, _*_)` cumulative-
  * product idiom (O(|frame|²) buffer copying) in the Kaplan–Meier /
  * survival-curve estimators.
  *
  * As a window aggregate over a running frame (UNBOUNDED PRECEDING →
  * CURRENT ROW) Spark's AggregateProcessor updates the buffer row by
  * row IN FRAME ORDER, so the value is the exact left-associated
  * product Π f_1 · f_2 · … · f_k — bit-identical to the fold it
  * replaces and to DuckDB's windowed `product()` (no exp/log detour,
  * no reassociation). Nulls are skipped like built-in aggregates.
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  private lazy val product = AttributeReference("product", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(product)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(1.0))
  override lazy val updateExpressions: Seq[Expression] =
    Seq(If(IsNull(child), product, Multiply(product, child)))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Multiply(product.left, product.right))
  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}

object ProductAgg {
  /** `product(c)` as an aggregate/window Column (c cast to double by
    * the caller if needed).
    */
  def product(c: Column): Column =
    bridge.toColumn(ProductAgg(bridge.toExpression(c)).toAggregateExpression())
}
