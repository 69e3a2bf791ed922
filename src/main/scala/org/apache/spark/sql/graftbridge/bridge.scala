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

  /** Catalyst's `private[sql]` bounded top-k aggregate (a size-`num`
    * priority queue per group, map-side combinable — the TakeOrdered
    * shape as an aggregate function). `reverse = true` keeps the
    * SMALLEST `num` values. Returned array is unsorted. */
  def collectTopK(e: Expression, num: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.aggregate
        .GraftCollect.topK(e, num, reverse))
}
