package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Minimal bridge into `private[sql]` Spark internals, isolated in one
  * place: Column↔Expression conversion (the Spark-4 replacement for the
  * removed `new Column(expr)`), and the engine's native xxhash64 so our
  * custom expressions hash bit-identically to `functions.xxhash64`.
  */
object Shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Same value as `xxhash64(stringCol)` for seed 42. */
  def xxhash64String(s: UTF8String, seed: Long): Long =
    XxHash64Function.hash(s, StringType, seed)
}
