package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column/Expression conversion
 * (`org.apache.spark.sql.classic.ExpressionUtils`). Lives under the
 * `org.apache.spark.sql` package so the graft library can expose custom
 * Catalyst expressions as ordinary `Column`s — the same technique Spark
 * extension libraries use.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
