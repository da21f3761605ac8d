package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Catalyst-Expression converters.
  *
  * Spark 4's public `Column` wraps a ColumnNode, not an Expression, so
  * planting a raw Catalyst expression (e.g. the internal codegen
  * `BloomFilterMightContain`) into a DataFrame needs the classic
  * converter. This is the ONLY place the engine reaches into Spark's
  * private API surface, and only for the two total functions below —
  * everything else goes through the public function registry
  * (graft.expressions.GraftFunctions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
