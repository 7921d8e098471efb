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

  /** `DataType.sameType` (equality ignoring nullability at every level) is
    * `private[spark]`; the stored-artifact schema validation in
    * `graft.sources.IO.readStamped` needs exactly that comparison.
    */
  def sameTypeIgnoreNullability(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)
}
