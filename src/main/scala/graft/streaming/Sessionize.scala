package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * User sessionization (gap-based): consecutive events of a user belong
 * to one session while the inter-event gap stays under `gapNanos`.
 *
 * Two implementations with identical session semantics:
 *
 *  - [[batch]]: gap-and-islands over window functions — the oracle-gated
 *    form (`sessionize` query; DuckDB twin uses the same lag/cumsum
 *    construction);
 *  - [[streaming]]: `flatMapGroupsWithState` keeping one open session
 *    per user as explicit state (SURVEY §2.9's custom-state surface) —
 *    emits each session when a later event closes it. Assumes per-user
 *    event-time-ordered arrival across micro-batches (enforce upstream
 *    with a watermark + sort, as usual for state-machine sinks); the
 *    final open session per user stays in state, which is exactly the
 *    online/offline difference the spec pins down.
 */
object Sessionize {

  final case class Event(user_id: Long, ts: Long) // ts = epoch nanos
  final case class Session(user_id: Long, session_start: Long,
    n_events: Long, duration_s: Long)
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** Batch gap-and-islands: one row per completed session. Accepts
    * `ts` as BIGINT nanos or any timestamp type ([[graft.sources.EventTime]]). */
  def batch(eventsIn: DataFrame, gapNanos: Long): DataFrame = {
    val events = graft.sources.EventTime.normalize(eventsIn, "ts")
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNanos, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        // integer division: epoch-nanos exceed double precision (2^53)
        expr("cast(div(min(ts), 1000000000) as bigint)").as("session_start"),
        count(lit(1)).as("n_events"),
        expr("cast(div(max(ts) - min(ts), 1000000000) as bigint)").as("duration_s"))
      .select("user_id", "session_start", "n_events", "duration_s")
  }

  /** Streaming state machine: one [[OpenSession]] per user. */
  def streaming(events: Dataset[Event], gapNanos: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[OpenSession]) =>
          val closed = scala.collection.mutable.ListBuffer.empty[Session]
          var open = state.getOption
          evs.toSeq.sortBy(_.ts).foreach { e =>
            open match {
              case Some(s) if e.ts < s.last =>
                // out-of-contract late arrival (older than state): drop it
                // like a watermark would — merging would rewind `last`
                // and corrupt every subsequent session boundary
                ()
              case Some(s) if e.ts - s.last <= gapNanos =>
                open = Some(s.copy(last = e.ts, n = s.n + 1))
              case Some(s) =>
                closed += Session(user, s.start / 1000000000L, s.n,
                  (s.last - s.start) / 1000000000L)
                open = Some(OpenSession(e.ts, e.ts, 1))
              case None =>
                open = Some(OpenSession(e.ts, e.ts, 1))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }
}
