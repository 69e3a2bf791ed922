package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Band (interval-tolerance) join — pairs of rows with equal key whose
 * timestamps lie within `tol` of each other: the relational operator
 * Spark has no native physical strategy for (a raw
 * `|l.ts - r.ts| <= tol` condition plans as a nested-loop join).
 *
 * Re-expressed as an EQUALITY join on time bins of width `tol`: any
 * qualifying pair is at most one bin apart, so the left side explodes
 * to its bin ± 1 (3 rows) and joins `(key, bin)` — a plain hash join
 * whose work is bounded by true pair density, followed by the exact
 * band filter. At 100 TB this shuffles each side once on (key, bin);
 * skew on hot keys is handled like any equi-join (AQE / salting).
 */
object RangeJoin {

  /** @return columns of `left` and `right` (key deduplicated) for pairs
    *         with equal `key` and `|left.lts - right.rts| <= tol`. */
  def bandJoin(left: DataFrame, right: DataFrame, key: String,
               lts: String, rts: String, tol: Long): DataFrame = {
    require(tol > 0)
    val l = left
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bin", col("__off") + expr(s"div($lts, $tol)"))
      .drop("__off")
    val r = right.withColumn("__bin", expr(s"div($rts, $tol)"))
    // no dedup needed: the right row has one bin, so each qualifying
    // pair joins on exactly one of the left row's three bins
    l.join(r, Seq(key, "__bin"))
      .filter(abs(col(lts) - col(rts)) <= tol)
      .drop("__bin")
  }

  /**
   * Interval OVERLAP join — pairs of VARIABLE-LENGTH intervals with
   * equal key that intersect (`l.s <= r.e AND r.s <= l.e`, closed
   * ends). The general form of [[bandJoin]] (which is the equal-
   * length special case): campaign windows × user sessions, outage
   * windows × requests.
   *
   * Grid decomposition on cells of width `cellWidth`: each interval
   * emits its covered cell range, candidates meet on `(key, cell)`,
   * the exact predicate verifies, and each qualifying pair is counted
   * EXACTLY ONCE — only in the cell containing `greatest(l.s, r.s)`
   * (the overlap's left edge), the [[SpatialJoin]] accounting trick,
   * so no distinct pass. One shuffle per side on `(key, cell)`; cell
   * volume is interval-length/cellWidth-bounded (size the width to
   * the typical interval, exactly like the distance join's radius).
   * Contract: every interval must satisfy `s <= e` — an inverted
   * interval would emit a DESCENDING `sequence` cell range and match
   * under a predicate that has no meaning for it.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   ls: String, le: String, rs: String, re: String,
                   cellWidth: Long): DataFrame = {
    require(cellWidth > 0)
    val l = left
      .withColumn("__cell",
        explode(expr(s"sequence(div($ls, $cellWidth), div($le, $cellWidth))")))
    val r = right
      .withColumn("__cell",
        explode(expr(s"sequence(div($rs, $cellWidth), div($re, $cellWidth))")))
    l.join(r, Seq(key, "__cell"))
      .filter(col(ls) <= col(re) && col(rs) <= col(le))
      .filter(col("__cell") === expr(s"div(greatest($ls, $rs), $cellWidth)"))
      .drop("__cell")
  }
}
