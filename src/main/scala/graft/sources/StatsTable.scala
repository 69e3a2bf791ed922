package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.SortedFloor

/**
 * Bucket-stats metadata table + as-of lookup — the Spark analog of the
 * reference's index table and its `getRowOrBefore` routing
 * (`Index.java:44-57`, `Index.java:115-122`): for a probe z-key, find the
 * greatest bucket key ≤ probe.
 *
 * The stats relation is metadata-scale (one row per bucket), so the
 * sorted key array rides the plan as a literal and each probe
 * binary-searches inside generated code (the [[SortedFloor]] native
 * expression — no UDF, stays in WholeStageCodegen). Probes below the
 * first bucket return null, like an empty `getRowOrBefore`.
 */
object StatsTable {

  /** For each row of `probes`, the greatest `keys` entry ≤ `probeCol`,
    * as a new column `bucket_key`. */
  def asofLookup(spark: SparkSession, probes: DataFrame, probeCol: String,
                 stats: DataFrame, statsKeyCol: String): DataFrame = {
    val keys: Array[Long] = stats.select(col(statsKeyCol).cast("long"))
      .distinct().orderBy(col(statsKeyCol))
      .collect().map(_.getLong(0))
    probes.withColumn("bucket_key",
      Bridge.column(SortedFloor(
        Bridge.expression(typedLit(keys)),
        Bridge.expression(col(probeCol).cast("long")))))
  }
}
