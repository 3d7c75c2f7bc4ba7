package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the Column ↔ Catalyst Expression conversion, which
  * Spark 4 keeps `private[sql]` (classic.ExpressionUtils). Lives inside the
  * org.apache.spark.sql package solely to re-export those two calls for
  * graft's custom expressions — standard practice for libraries shipping
  * native Catalyst expressions against the classic API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
