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
      // integer division: epoch-nanos exceed double precision (2^53)
      .withColumn("event_time", expr("timestamp_micros(div(ts, 1000))"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(round(value*100) as bigint)")).as("sum_cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_cents"))

  /**
   * Start streaming ingest of an events stream into a z-clustered point
   * store at `storePath`, maintaining stats and compacting per batch.
   *
   * Idempotent under micro-batch REPLAY (foreachBatch is
   * at-least-once): each batch publishes its files two-phase under the
   * deterministic prefix `ingest-<batchId>` ([[graft.sources.TxDir]]) —
   * a replayed batch whose set is already complete is skipped, a
   * half-published set is wiped and redone.
   */
  def start(events: DataFrame, storePath: String, statsPath: String,
            checkpoint: String, splitThreshold: Long): StreamingQuery = {
    // converge any recluster interrupted in a previous run BEFORE new
    // batches land — otherwise a later recovery would swap a stale
    // snapshot over them
    recoverRecluster(events.sparkSession, storePath)
    // Compaction is DEFERRED one batch: batch N's files are split while
    // processing batch N+1, after N's checkpoint committed — splitting
    // them inside batch N would consume the very ingest-N marker files
    // that make a replay of N idempotent. (After a restart the deferred
    // list is empty; files missed that way stay merely coarse until the
    // next recluster.)
    var pendingFiles: Seq[String] = Nil
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val published = ingestBatch(batch, batchId, storePath)
        compactOversizedFiles(batch.sparkSession, storePath, splitThreshold,
          Some(pendingFiles))
        pendingFiles = published
        refreshStats(batch.sparkSession, storePath, statsPath, splitThreshold)
      }
      .start()
  }

  /** One micro-batch of the put path — safe to call repeatedly with the
    * same (batch, batchId): replays converge instead of duplicating.
    * Returns the batch's published data file names. */
  def ingestBatch(batch: DataFrame, batchId: Long, storePath: String): Seq[String] = {
    val spark = batch.sparkSession
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(storePath)
    val prefix = s"ingest-$batchId"
    if (graft.sources.TxDir.isComplete(fs, dest, prefix)) {
      graft.sources.TxDir.publishedNames(fs, dest, prefix)
    } else {
      graft.sources.TxDir.cleanPartial(fs, dest, prefix)
      val pts = PointStore.points(batch,
        col("event_id"), expr("cast(floor(value*100) as int)"), col("user_id"))
      val scratch = new Path(storePath + s".batch-$batchId")
      fs.delete(scratch, true)
      PointStore.write(pts, scratch.toString)
      graft.sources.TxDir.publish(fs, scratch, dest, prefix)
    }
  }

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
   *
   * The dir swap cannot be one atomic rename, so a `_READY` marker
   * makes every crash state recoverable: scratch without marker =
   * unfinished build (discard); scratch with marker = finished build
   * (the swap can complete regardless of whether the old store was
   * already deleted). [[recoverRecluster]] runs first and converges any
   * interrupted prior attempt. Single-writer maintenance job.
   */
  def recluster(spark: SparkSession, storePath: String, threshold: Long): Unit = {
    recoverRecluster(spark, storePath)
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = new Path(storePath)
    val scratch = new Path(storePath + ".compacting")
    val df = spark.read.parquet(storePath)
    val parts = math.max(1, math.ceil(df.count().toDouble / threshold).toInt)
    fs.delete(scratch, true)
    PointStore.write(df, scratch.toString, parts)
    fs.create(new Path(scratch, ReadyMarker)).close()
    fs.delete(store, true)
    fs.rename(scratch, store)
    fs.delete(new Path(store, ReadyMarker), false)
    ()
  }

  private val ReadyMarker = "_GRAFT_RECLUSTER_READY"

  /** Converge an interrupted [[recluster]] (call before reads/writes
    * when a crash may have occurred). */
  def recoverRecluster(spark: SparkSession, storePath: String): Unit = {
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = new Path(storePath)
    val scratch = new Path(storePath + ".compacting")
    if (fs.exists(scratch)) {
      if (fs.exists(new Path(scratch, ReadyMarker))) {
        // build finished: complete the swap
        fs.delete(store, true)
        fs.rename(scratch, store)
      } else {
        // build unfinished: old store is intact, discard the scratch
        fs.delete(scratch, true)
      }
    }
    if (fs.exists(new Path(store, ReadyMarker)))
      fs.delete(new Path(store, ReadyMarker), false)
    ()
  }

  /**
   * Split every data file holding more than `threshold` rows into
   * z-range-partitioned files of at most ~threshold rows (the
   * `splitBucket` analog, `Index.java:193-230`). File-local, and
   * CRASH-CONVERGENT: outputs publish two-phase under a prefix derived
   * from the source file name, so a replay after a crash either skips
   * (complete set found → just drop the source), or wipes a partial set
   * and redoes. A reader between crash and the next maintenance run may
   * transiently see a partial set alongside the source — single-writer
   * maintenance, same dirty-window as any file-layout compaction
   * without a commit log.
   */
  def compactOversizedFiles(spark: SparkSession, storePath: String,
                            threshold: Long,
                            onlyFiles: Option[Seq[String]] = None): Unit = {
    if (onlyFiles.exists(_.isEmpty)) return
    val perFile = spark.read.parquet(storePath)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min("zkey").as("zlo"), max("zkey").as("zhi"))
      .filter(col("n") > threshold)
      // a file whose rows all share one zkey cannot be range-split —
      // rewriting it would churn forever; it is one logical bucket
      // (the reference's max-depth case, Index.java:200-203)
      .filter(col("zlo") =!= col("zhi"))
      .collect()
      .filter(row => onlyFiles.forall(allow =>
        allow.exists(name => row.getString(0).endsWith("/" + name))))
    if (perFile.isEmpty) return
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(storePath)
    perFile.foreach { row =>
      val file = row.getString(0)
      val srcPath = new Path(new java.net.URI(file))
      val prefix = "split-" + java.security.MessageDigest.getInstance("MD5")
        .digest(srcPath.getName.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      if (!graft.sources.TxDir.isComplete(fs, dest, prefix)) {
        graft.sources.TxDir.cleanPartial(fs, dest, prefix)
        val n = row.getLong(1)
        val parts = math.max(2, math.ceil(n.toDouble / threshold).toInt)
        val scratch = new Path(storePath + s".$prefix")
        fs.delete(scratch, true)
        PointStore.write(spark.read.parquet(file), scratch.toString, parts)
        graft.sources.TxDir.publish(fs, scratch, dest, prefix)
      }
      fs.delete(srcPath, false)
      ()
    }
  }
}
