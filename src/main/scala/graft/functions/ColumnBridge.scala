// Lives under org.apache.spark.sql only to reach the private[sql]
// Column <-> Expression converters (Spark 4 moved Column to an opaque
// ColumnNode; classic.ExpressionUtils is the sanctioned bridge). The
// standard pattern for libraries that ship custom Catalyst expressions
// without registering them in a FunctionRegistry.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
