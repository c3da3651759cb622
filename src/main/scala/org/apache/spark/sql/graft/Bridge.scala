package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into `private[sql]` Column↔Expression plumbing.
  *
  * Spark 4 made the classic `Column(expr)`/`col.expr` path `private[sql]`
  * (columns are ColumnNode-backed now); extension libraries reach it via a
  * shim in the sql package namespace. This is the only file outside the
  * `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; expressions outside
    * the sql namespace need it to declare `ExpectsInputTypes.inputTypes`. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
