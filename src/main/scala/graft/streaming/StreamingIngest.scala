package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.PointStore

/**
 * Online ingest — the Structured Streaming re-expression of the
 * reference's synchronous put path with adaptive splitting
 * (`Client.insert` → `Index.notifyInsertion` → `maySplit`,
 * `Index.java:175-230`; SURVEY §2.9):
 *
 *  - every micro-batch is z-keyed and appended z-clustered (the `put`);
 *  - the bucket-stats table is refreshed per batch (the counter
 *    `incrementColumnValue` analog, recomputed instead of mutated —
 *    idempotent under batch replay);
 *  - oversized data files are split into threshold-sized z-ranged
 *    files (the `splitBucket` analog). Minor compaction is FILE-LOCAL:
 *    only rows of oversized files are rewritten, each into files that
 *    partition the parent's z-interval, so the rewrite cost tracks the
 *    hot buckets, not the store (the property that makes the
 *    reference's recursive split skew-proof). Like any LSM, different
 *    append GENERATIONS may overlap in z-range — pruning still works
 *    through per-file min/max stats, just less tightly — and
 *    [[recluster]] is the major compaction that restores globally
 *    disjoint z-ranges.
 *
 * The transform is shared verbatim with the batch path ([[hourlyCounts]]
 * runs unchanged under `read` and `readStream` — watermarks are no-ops
 * in batch), which is the Spark-first guarantee that online and offline
 * answers agree.
 */
object StreamingIngest {

  /** Event-time hourly rollup, identical for batch and streaming input
    * (the gated `events_hourly` query is its batch twin). `ts` is BIGINT
    * nanoseconds (driver tables) → event-time timestamp. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(round(value*100) as bigint)")).as("sum_cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_cents"))

  /**
   * Start streaming ingest of an events stream into a z-clustered point
   * store at `storePath`, maintaining stats and compacting per batch.
   */
  def start(events: DataFrame, storePath: String, statsPath: String,
            checkpoint: String, splitThreshold: Long): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pts = PointStore.points(batch,
          col("event_id"), expr("cast(floor(value*100) as int)"), col("user_id"))
        PointStore.append(pts, storePath)
        compactOversizedFiles(batch.sparkSession, storePath, splitThreshold)
        refreshStats(batch.sparkSession, storePath, statsPath, splitThreshold)
      }
      .start()

  /** Recompute the bucket-stats table (metadata-scale overwrite —
    * idempotent, unlike the reference's non-transactional in-place
    * counter updates, `Index.java:175-181`). */
  def refreshStats(spark: SparkSession, storePath: String, statsPath: String,
                   threshold: Long): Unit = {
    PointStore.open(spark, storePath)
      .adaptiveStats(threshold, statsDepth = 48)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath)
  }

  /**
   * Major compaction: globally re-cluster the store by zkey (restores
   * pairwise-disjoint per-file z-ranges across all generations).
   * Written to a scratch dir first, then atomically swapped in.
   */
  def recluster(spark: SparkSession, storePath: String, threshold: Long): Unit = {
    val df = spark.read.parquet(storePath)
    val parts = math.max(1, math.ceil(df.count().toDouble / threshold).toInt)
    val scratch = storePath + ".compacting"
    PointStore.write(df, scratch, parts)
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(storePath), true)
    fs.rename(new Path(scratch), new Path(storePath))
    ()
  }

  /**
   * Split every data file holding more than `threshold` rows into
   * z-range-partitioned files of at most ~threshold rows (the
   * `splitBucket` analog, `Index.java:193-230`). File-local and
   * idempotent: replaying it after a crash converges.
   */
  def compactOversizedFiles(spark: SparkSession, storePath: String,
                            threshold: Long): Unit = {
    val perFile = spark.read.parquet(storePath)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .collect()
    if (perFile.isEmpty) return
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    perFile.foreach { row =>
      val file = row.getString(0)
      val n = row.getLong(1)
      val parts = math.max(2, math.ceil(n.toDouble / threshold).toInt)
      // rewrite this file's rows into `parts` z-ranged files, then drop it
      val rows = spark.read.parquet(file)
      PointStore.append(rows, storePath, parts)
      fs.delete(new Path(new java.net.URI(file)), false)
      ()
    }
  }
}
