/* Bridge into Spark's package-private Column <-> Expression conversions.
 * Spark 4 hides `classic.ExpressionUtils` behind `private[sql]`; extension
 * libraries that define native Catalyst expressions conventionally expose
 * them through a small shim in the org.apache.spark.sql package.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
