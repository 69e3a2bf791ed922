package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal as-of join — for every left row, the latest right row with
 * the same key and `right.ts <= left.ts` (inclusive) — the
 * whole-relation generalization of the reference's single-probe
 * `getRowOrBefore` (`Index.java:115-122`).
 *
 * Implementation is the classic union + keyed window sweep: tag both
 * sides, sort within each key by (ts, side, value) and carry the last
 * non-null right value forward. ONE hash shuffle on the key and a
 * per-key sort — no join explosion, no broadcast requirement on either
 * side, so both relations can be data-scale (the asymptotics of a
 * sort-merge as-of). Ties: a right row AT the left row's timestamp
 * matches (inclusive); multiple right rows on the same (key, ts) —
 * the greatest `rightVal` wins, deterministically.
 */
object AsOfJoin {

  /** @param left  relation with `key`, `ts` and payload columns
    * @param right relation with `key`, `ts` and the value column
    * @return left rows + nullable `rightVal` column of the matched row */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightVal: String): DataFrame = {
    // carry the right value at its own type (any orderable type works
    // for the same-(key,ts) tie rule); a fixed cast would silently null
    // out non-conforming columns instead of failing fast
    val rightValType = right.schema(rightVal).dataType
    val leftCols = left.columns.filterNot(_ == rightVal)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"), lit(null).cast(rightValType).as(rightVal)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), col(rightVal)) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col(rightVal))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col(rightVal), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", rightVal)
      .withColumnRenamed("__match", rightVal)
  }

  /**
   * Forward as-of: for every left row, the EARLIEST right row with the
   * same key and `right.ts >= left.ts` (inclusive) — the pandas
   * `merge_asof(direction='forward')` shape ("the next deploy after
   * this error"). Same one-shuffle sweep as [[asof]], with the per-key
   * sort reversed; at equal `(key, ts)` the greatest `rightVal` wins,
   * mirroring the backward tie rule.
   */
  def asofForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                  rightVal: String): DataFrame = {
    val rightValType = right.schema(rightVal).dataType
    val leftCols = left.columns.filterNot(_ == rightVal)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"), lit(null).cast(rightValType).as(rightVal)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), col(rightVal)) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side"), col(rightVal))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col(rightVal), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", rightVal)
      .withColumnRenamed("__match", rightVal)
  }

  /**
   * Backward as-of with a match tolerance — the pandas
   * `merge_asof(tolerance=...)` shape: the latest at-or-before right
   * row matches ONLY if it is within `tol` of the left timestamp
   * (else null). The nearest-behind row IS the latest-within-tolerance
   * row when it qualifies, so filtering the single matched row is
   * exact, not an approximation. `ts` must be a numeric (canonical
   * nanos) column, since the tolerance is arithmetic. The matched
   * row's own timestamp rides along in a struct so value and
   * timestamp can never come from different rows.
   */
  def asofTolerance(left: DataFrame, right: DataFrame, key: String, ts: String,
                    rightVal: String, tol: Long): DataFrame = {
    val rightValType = right.schema(rightVal).dataType
    val leftCols = left.columns.filterNot(_ == rightVal)
    val nullMatch = lit(null).cast(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__mts", left.schema(ts).dataType),
        org.apache.spark.sql.types.StructField("__mv", rightValType))))
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"),
        lit(null).cast(rightValType).as(rightVal), nullMatch.as("__m")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), col(rightVal),
        struct(col(ts).as("__mts"), col(rightVal).as("__mv")).as("__m")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col(rightVal))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn(rightVal + "_tol",
        when(col(ts) - col("__match.__mts") <= tol, col("__match.__mv")))
      .drop("__side", "__m", "__match", rightVal)
      .withColumnRenamed(rightVal + "_tol", rightVal)
  }
}
