package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters: lets the
  * graft native expressions ([[graft.functions.PortableValueHash60]]
  * etc.) be used as Columns WITHOUT a per-session function-registry
  * round trip — the library helpers (`Dedup.portableHash64`,
  * `Cardinality.portableStringHash`) take only a Column and have no
  * session to register on (the `call_function` route needs one). Same
  * package-shim idiom as [[org.apache.spark.sql.execution.streaming.runtime]]'s
  * GraftLastExecution. */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
