package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (the
  * standard extension-library pattern for Spark 4's ColumnNode API). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is private[sql]; alias it so graft expressions
    * can declare `ExpectsInputTypes.inputTypes`. */
  type ADT = org.apache.spark.sql.types.AbstractDataType
}
