package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-local accessor for Catalyst's `CollectTopK` (scoped
  * `private` to this package): the bounded top-k aggregate — a
  * size-`num` priority queue per group, map-side combinable. The graft
  * library uses it for TakeOrdered-shaped per-group caps
  * ([[graft.operators.Curation.sourceCap]]); see
  * `org.apache.spark.sql.graftbridge.Bridge.collectTopK`. */
object GraftCollect {
  /** `reverse = true` keeps the SMALLEST `num` values; the returned
    * array is unsorted. */
  def topK(e: Expression, num: Int, reverse: Boolean): AggregateExpression =
    CollectTopK(e, num, reverse).toAggregateExpression()
}
