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

  /** Catalyst's bloom-filter-build aggregate (the machinery behind
    * Spark's own runtime row-group filtering): one pass over `e` (must
    * be a LongType hash, e.g. `xxhash64`) producing a serialized
    * `BloomFilter` as binary. Map-side combinable (buffers merge by
    * bit-or). */
  def bloomAgg(e: Expression, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        e,
        org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Membership probe against a serialized bloom filter (codegen'd; the
    * probe side of Spark's runtime filters). `value` must be the SAME
    * hash expression family used to build (`xxhash64`). NO false
    * negatives — a `false` is definitive absence; a `true` must be
    * re-verified exactly if exactness is required. */
  def bloomMightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloom), ExpressionUtils.expression(value)))
}
