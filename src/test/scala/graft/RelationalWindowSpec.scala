package graft

import org.apache.spark.sql.functions._

/**
 * Independent twins for the round-12 relational additions: the sliding
 * RANGE-frame aggregate is checked against a naive self-join spelling
 * (quadratic, test-only), and the Tukey-fence outlier gate against a
 * driver-side quantile computation — different plan shapes must agree
 * row-for-row before the DuckDB oracle ever sees either.
 */
class RelationalWindowSpec extends SparkSpec {

  private lazy val events =
    graft.sources.EventTime.events(spark, sf())

  test("events_sliding equals the naive self-join spelling") {
    val got = SparkEntry.queries("events_sliding")(spark, sf())
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap

    val e = events.select(col("event_id"), col("user_id"), col("ts"),
      expr("cast(round(value*100) as bigint)").as("cents"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") <= col("a.ts") &&
          col("b.ts") >= col("a.ts") - lit(3600000000000L))
      .groupBy(col("a.event_id"))
      .agg(count(lit(1)).as("w_cnt"), sum(col("b.cents")).as("w_sum_cents"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === naive)
    assert(got.nonEmpty)
    // sanity: at least one frame holds more than its own event
    assert(got.values.exists(_._1 > 1L))
  }

  test("outlier_events flags exactly the rows outside the driver-computed fences") {
    val cents = events
      .select(col("event_type"), col("event_id"),
        expr("cast(round(value*100) as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val fences = cents.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length
      // rank-selection quartiles: elements at ceil(n/4), ceil(3n/4)
      val q1 = sorted(((n + 3) / 4 - 1).max(0))
      val q3 = sorted(((3 * n + 3) / 4 - 1).max(0))
      t -> (q1, q3)
    }
    val expected = cents.filter { case (t, _, c) =>
      val (q1, q3) = fences(t)
      2 * c > 2 * q3 + 3 * (q3 - q1) || 2 * c < 2 * q1 - 3 * (q3 - q1)
    }.map(r => (r._2, r._1, r._3)).toSet
    val got = SparkEntry.queries("outlier_events")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    // the gate must flag something on the fixture, and never everything
    assert(got.nonEmpty && got.size < cents.length)
  }
}
