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

  test("batch/stream sessions agree under in-contract intra-batch reordering") {
    import spark.implicits._
    // the ordering contract: ANY arrival order within a micro-batch
    // (the state machine sorts per batch), per-user non-decreasing
    // ACROSS batches. This fixture scrambles every batch adversarially
    // and still demands exact batch parity.
    val t0 = 1704067200000000000L
    val evs = (for {
      u <- 0L until 5L
      s <- 0L until 4L   // 4 sessions per user, 2*Gap apart
      e <- 0L until 6L   // 6 events per session, 1s apart
    } yield Sessionize.Event(u, t0 + s * 2L * Gap + u * 1234567890L + e * 1000000000L)).toSeq
    val df = evs.zipWithIndex
      .map { case (ev, i) => (ev.user_id, ev.ts, i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val batchSessions = Sessionize.batch(df, Gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val src = Files.createTempDirectory("graft-sess-scramble").toString
    val rnd = new scala.util.Random(7)
    def writeSlice(path: String, lo: Long, hi: Long): Unit =
      rnd.shuffle(evs.filter(ev => ev.ts >= lo && ev.ts < hi))
        .toDS().coalesce(1).write.parquet(path)
    // sessions 0-1 | session 2 | session 3 — cross-batch order holds
    writeSlice(s"$src/b0", Long.MinValue, t0 + 3L * Gap)
    val sdf = spark.readStream.schema(evs.take(1).toDS().schema)
      .parquet(s"$src/*").as[Sessionize.Event]
    val q = Sessionize.streaming(sdf, Gap).writeStream
      .format("memory").queryName("sess_scramble").outputMode("append").start()
    try {
      q.processAllAvailable()
      writeSlice(s"$src/b1", t0 + 3L * Gap, t0 + 5L * Gap)
      q.processAllAvailable()
      writeSlice(s"$src/b2", t0 + 5L * Gap, Long.MaxValue)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_scramble").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // exact agreement: everything but each user's final open session
    val lastPerUser = batchSessions.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    assert(streamed === batchSessions -- lastPerUser,
      s"missing: ${(batchSessions -- lastPerUser) -- streamed}; extra: ${streamed -- (batchSessions -- lastPerUser)}")
    assert(streamed.size === 15) // 5 users x 3 closed sessions
  }

  test("streaming state machine emits exactly the non-final batch sessions") {
    import spark.implicits._
    val events = graft.sources.EventTime
      .normalize(spark.read.parquet(sf("sf0.01") + "/events.parquet"), "ts")
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("ts"))
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
