package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Catalyst Expression
  * converters — the standard extension-library technique (public Spark
  * connectors and engines ship the same shim) for wrapping an internal
  * expression that has no public DSL constructor. Used for
  * `BloomFilterMightContain`, whose only public surface is the
  * optimizer's runtime-filter injection.
  */
object GraftSqlBridge {

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
