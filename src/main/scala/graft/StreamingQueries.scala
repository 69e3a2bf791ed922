package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PointStore
import graft.streaming.StreamingIngest
import graft.zorder.IntRange

/**
 * Streaming-mode parity gate: the ONLINE ingest loop itself — the real
 * `foreachBatch` path with two-phase publishing, per-batch stats deltas
 * and footer-probed compaction ([[StreamingIngest.start]]) — runs
 * against the events table as a file stream, and the resulting
 * z-clustered store answers a rectangle aggregate. The oracle is plain
 * SQL over the SOURCE table: the gate therefore proves end-to-end that
 * streaming ingest loses nothing, duplicates nothing, and the stored
 * derivation matches the batch definition (exactly-once net effect of
 * the at-least-once machinery). Sums over id/x/y pin the exact row
 * multiset, not just the count.
 */
object StreamingQueries {

  // same rectangle the batch range queries use (PointQueries)
  private val RX = IntRange(10000, 30000)
  private val RY = IntRange(40, 110)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_ingest_range" -> ((s, dir) => {
      import org.apache.hadoop.fs.{FileUtil, Path}
      val tmp = Files.createTempDirectory("graft-stream-gate").toString
      // the file stream source wants a DIRECTORY to watch; the source
      // table may itself be a file OR a directory-shaped parquet
      // dataset — FileUtil.copy handles both recursively (a bare
      // Files.copy of a directory would copy an empty dir and the gate
      // would silently compare an empty store)
      val conf = s.sparkContext.hadoopConfiguration
      val src = new Path(s"$dir/events.parquet")
      val fs = src.getFileSystem(conf)
      Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      FileUtil.copy(fs, src, fs, new Path(s"$tmp/in/events.parquet"), false, conf)
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema).parquet(s"$tmp/in")
      val q = StreamingIngest.start(stream, s"$tmp/store", s"$tmp/stats",
        s"$tmp/ckpt", splitThreshold = 100000L)
      try q.processAllAvailable() finally q.stop()
      val agg = PointStore.rangeQuery(s.read.parquet(s"$tmp/store"), RX, RY)
        .agg(count(lit(1)).as("cnt"), sum(col("id")).as("id_sum"),
          sum(col("x").cast("long")).as("x_sum"),
          sum(col("y").cast("long")).as("y_sum"))
      // evaluate EAGERLY so the full temp tree (store copy, checkpoint)
      // can be deleted before returning — otherwise every Verify/Bench
      // run leaks a store-sized copy in /tmp
      val rows = agg.collect().toSeq
      val outSchema = agg.schema
      fs.delete(new Path(tmp), true)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    }),

    // Stateful streaming dedup: dropDuplicates state must survive
    // across microbatches — the source is rewritten as several files
    // and streamed one file per trigger, so most (user_id, event_type)
    // keys repeat in LATER batches than their first arrival. Lost or
    // leaking state would double-emit keys and fail the oracle (a
    // plain batch distinct over the source). Only key columns flow
    // into the dedup, so the surviving-row arrival order — the one
    // nondeterministic degree of freedom — cannot affect the result.
    "stream_dedup" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft-stream-dedup").toString
      s.read.parquet(s"$dir/events.parquet")
        .select("user_id", "event_type")
        .repartition(4).write.parquet(s"$tmp/in")
      val schema = s.read.parquet(s"$tmp/in").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      val q = stream.dropDuplicates("user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
      val agg = s.read.parquet(s"$tmp/out")
        .groupBy("event_type").agg(count(lit(1)).as("n_users"))
      val rows = agg.collect().toSeq
      val outSchema = agg.schema
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    })
  )

  val oracle: Map[String, String] = Map(
    "stream_ingest_range" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(event_id) AS BIGINT) AS id_sum,
  CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS x_sum,
  CAST(sum(user_id) AS BIGINT) AS y_sum
FROM events
WHERE CAST(floor(value*100) AS INT) BETWEEN ${RX.min} AND ${RX.max}
  AND user_id BETWEEN ${RY.min} AND ${RY.max}""",

    "stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type"""
  )
}
