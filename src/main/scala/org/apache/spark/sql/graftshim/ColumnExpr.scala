package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Narrow bridge to Spark's `private[sql]` Column ↔ Expression
  * conversion (Spark 4 moved Column onto ColumnNode; classic
  * ColumnNodeToExpressionConverter owns the conversion — the
  * ExpressionUtils path merely wraps the node lazily). Used by graft's
  * manifest data skipping to inspect a filter's conjuncts — read-only,
  * no plan mutation. */
object ColumnExpr {
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
