package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 *
 * The metadata-scale contract is EXPLICIT: past [[DefaultMaxLiteralKeys]]
 * buckets the lookup switches to a two-level form — a small literal of
 * chunk minima routes each probe (codegen binary search) to a chunk via
 * a broadcast equality join, and a second binary search inside the
 * chunk's key array finishes the floor. The plan then carries O(n/chunk)
 * literal entries instead of O(n), the bulk of the keys travel as
 * broadcast DATA, and no join ever degenerates to a nested loop.
 */
object StatsTable {

  /** Above this many distinct bucket keys the single plan-literal array
    * would bloat the plan / break codegen limits; switch to the chunked
    * broadcast form. */
  val DefaultMaxLiteralKeys: Int = 100000

  /** For each row of `probes`, the greatest `keys` entry ≤ `probeCol`,
    * as a new column `bucket_key`. */
  def asofLookup(spark: SparkSession, probes: DataFrame, probeCol: String,
                 stats: DataFrame, statsKeyCol: String,
                 maxLiteralKeys: Int = DefaultMaxLiteralKeys): DataFrame = {
    val keys: Array[Long] = stats.select(col(statsKeyCol).cast("long"))
      .distinct().orderBy(col(statsKeyCol))
      .collect().map(_.getLong(0))
    def floorOf(keysCol: Column, probe: Column): Column =
      Bridge.column(SortedFloor(
        Bridge.expression(keysCol), Bridge.expression(probe)))
    if (keys.length <= maxLiteralKeys) {
      probes.withColumn("bucket_key",
        floorOf(typedLit(keys), col(probeCol).cast("long")))
    } else {
      import spark.implicits._
      val chunks = keys.grouped(maxLiteralKeys).map(c => (c.head, c)).toSeq
      val minima: Array[Long] = chunks.map(_._1).toArray
      val chunkDf = chunks.toDF("__cmin", "__ckeys")
      probes
        .withColumn("__cmin", floorOf(typedLit(minima), col(probeCol).cast("long")))
        .join(broadcast(chunkDf), Seq("__cmin"), "left")
        .withColumn("bucket_key", floorOf(col("__ckeys"), col(probeCol).cast("long")))
        .drop("__cmin", "__ckeys")
    }
  }
}
