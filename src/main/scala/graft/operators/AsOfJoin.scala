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
}
