package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  private val Gap = 86400L * 1000000000L // 24h in nanos

  test("batch sessionization: sessions partition each user's events") {
    val events = spark.read.parquet(sf("sf0.01") + "/events.parquet")
    val sessions = Sessionize.batch(events, Gap)
    // every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).head().getLong(0) === events.count())
    // sessions of one user never overlap: gap between consecutive
    // sessions exceeds the threshold
    val byUser = sessions.orderBy("user_id", "session_start").collect()
      .groupBy(_.getLong(0))
    byUser.values.foreach { ss =>
      ss.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getLong(1) + a.getLong(3)
          assert(b.getLong(1) - aEnd > 86400L - 2, s"$a / $b") // second-rounded gap
        case _ =>
      }
    }
  }

  test("out-of-contract late events are dropped, not merged backwards") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-late-sess").toString
    val t0 = 1704067200000000000L
    def mk(id: Long, ts: Long) = Seq(Sessionize.Event(5L, ts)).toDS()
      .withColumn("marker", lit(id)).drop("marker").as[Sessionize.Event]
    mk(1, t0).write.parquet(s"$src/b0")
    val sdf = spark.readStream
      .schema(mk(0, t0).schema).parquet(s"$src/*").as[Sessionize.Event]
    val q = Sessionize.streaming(sdf, Gap).writeStream
      .format("memory").queryName("late_sess").outputMode("append").start()
    try {
      q.processAllAvailable()
      // a late event FAR older than the open session must not rewind it
      mk(2, t0 - 100L * 86400L * 1000000000L).write.parquet(s"$src/b1")
      q.processAllAvailable()
      // next in-order event within the gap extends the original session
      mk(3, t0 + 1000L).write.parquet(s"$src/b2")
      q.processAllAvailable()
      // far-future event closes it
      mk(4, t0 + 10L * 86400L * 1000000000L).write.parquet(s"$src/b3")
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("late_sess").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly one closed session: started at t0, 2 events, ~0s duration
    assert(sessions.toSeq === Seq((t0 / 1000000000L, 2L, 0L)), sessions.mkString(","))
  }

  test("streaming state machine emits exactly the non-final batch sessions") {
    import spark.implicits._
    val events = spark.read.parquet(sf("sf0.01") + "/events.parquet")
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("ts").cast("long").as("ts"))
      .cache()
    val batchSessions = Sessionize.batch(
      spark.read.parquet(sf("sf0.01") + "/events.parquet")
        .filter(col("user_id") < 30), Gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // stream in event-time order: three consecutive time slices
    val src = Files.createTempDirectory("graft-sess").toString
    val cuts = events.stat.approxQuantile("ts", Array(0.33, 0.66), 0.001)
    events.filter(col("ts") <= cuts(0)).write.parquet(s"$src/b0")
    val sdf = spark.readStream.schema(events.schema).parquet(s"$src/*").as[Sessionize.Event]
    val q = Sessionize.streaming(sdf, Gap).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      events.filter(col("ts") > cuts(0) && col("ts") <= cuts(1)).write.parquet(s"$src/b1")
      q.processAllAvailable()
      events.filter(col("ts") > cuts(1)).write.parquet(s"$src/b2")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // streaming emits a session when a later event closes it => every
    // emitted session is a batch session, and what's missing is exactly
    // each user's final (still-open) session
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batchSessions),
      s"not in batch: ${streamed -- batchSessions}")
    val lastPerUser = batchSessions.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    assert(batchSessions -- streamed === lastPerUser)
  }
}
