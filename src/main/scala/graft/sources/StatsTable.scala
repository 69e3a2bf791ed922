package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucket-stats metadata table + as-of lookup — the Spark analog of the
 * reference's index table and its `getRowOrBefore` routing
 * (`Index.java:44-57`, `Index.java:115-122`): for a probe z-key, find the
 * greatest bucket key ≤ probe.
 *
 * The stats relation is metadata-scale (one row per bucket), so the
 * lookup side is broadcast as a sorted array and each probe does a
 * driver-free binary search inside the executors — the same asymptotics
 * as HBase's reverse row lookup, but embarrassingly parallel over the
 * probe side. Correct for any probe ≥ the smallest bucket key (probes
 * below the first bucket return null, like an empty `getRowOrBefore`).
 */
object StatsTable {

  /** For each row of `probes`, the greatest `keys` entry ≤ `probeCol`,
    * as a new column `bucket_key`. */
  def asofLookup(spark: SparkSession, probes: DataFrame, probeCol: String,
                 stats: DataFrame, statsKeyCol: String): DataFrame = {
    val keys: Array[Long] = stats.select(col(statsKeyCol).cast("long"))
      .distinct().orderBy(col(statsKeyCol))
      .collect().map(_.getLong(0))
    val bc = spark.sparkContext.broadcast(keys)
    val floorOf = udf { probe: Long =>
      val ks = bc.value
      var lo = 0; var hi = ks.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ks(mid) <= probe) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (ans < 0) None else Some(ks(ans))
    }
    probes.withColumn("bucket_key", floorOf(col(probeCol).cast("long")))
  }
}
