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
      val tmp = Files.createTempDirectory("graft-stream-gate").toString
      // the file stream source wants a DIRECTORY to watch
      Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
        java.nio.file.Paths.get(s"$tmp/in/events.parquet"))
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema).parquet(s"$tmp/in")
      val q = StreamingIngest.start(stream, s"$tmp/store", s"$tmp/stats",
        s"$tmp/ckpt", splitThreshold = 100000L)
      try q.processAllAvailable() finally q.stop()
      PointStore.rangeQuery(s.read.parquet(s"$tmp/store"), RX, RY)
        .agg(count(lit(1)).as("cnt"), sum(col("id")).as("id_sum"),
          sum(col("x").cast("long")).as("x_sum"),
          sum(col("y").cast("long")).as("y_sum"))
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
  AND user_id BETWEEN ${RY.min} AND ${RY.max}"""
  )
}
