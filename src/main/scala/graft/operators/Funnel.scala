package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis over an event log — "of the users who did A,
 * how many then did B, then C?" (the reference engine has no analog;
 * this is the event-analytics companion to the sessionizer,
 * SURVEY §2.4/§2.5 extension surface).
 *
 * Semantics: a user completes stage 1 at their FIRST stage-1 event;
 * stage k > 1 at their first stage-k event STRICTLY AFTER their stage-
 * (k−1) completion time. Strict ordering makes the funnel a chain of
 * min-aggregates — deterministic, no per-event state machine, and
 * exactly replayable in SQL (each stage is one `min(t) WHERE t > prev`
 * grouped join).
 *
 * Scale shape: stage 1 is one shuffle on the user key; every later
 * stage joins the (shrinking) frontier back to the event scan on the
 * SAME key — co-partitioned, no new partitioning ever introduced. The
 * number of stages is a small constant, so the whole funnel is
 * O(stages) passes with monotonically decreasing right-hand sides.
 */
object Funnel {

  /**
   * Per-user completion times: `(u, t1 … tN)`, one row per user who
   * completed stage 1; `tk` is NULL where the funnel stopped earlier.
   */
  def stageTimes(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("t"),
      col(typeCol).as("ty"))
    val first = ev.filter(col("ty") === stages.head)
      .groupBy("u").agg(min(col("t")).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (stage, i)) =>
      val k = i + 1
      val next = ev.filter(col("ty") === stage)
        .join(acc.select(col("u"), col(s"t$i").as("prev")), "u")
        .filter(col("t") > col("prev"))
        .groupBy("u").agg(min(col("t")).as(s"t$k"))
      acc.join(next, Seq("u"), "left")
    }
  }

  /** Funnel depth counts: `(stage, event_type, n_users)` — how many
    * users reached each stage in order. */
  def counts(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val times = stageTimes(events, stages, userCol, tsCol, typeCol)
    val perStage = stages.zipWithIndex.map { case (stage, i) =>
      times.agg(count(col(s"t${i + 1}")).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"),
          col("n_users"))
    }
    perStage.reduce(_ unionByName _)
  }
}
