package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val H = Analytics.HourNanos
  private val D = Analytics.DayNanos

  // (event_id, user_id, ts, event_type, value)
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")

  test("cohortRetention: triangle matches a hand computation") {
    // u1 first day 0, active days {0, 1, 3}; u2 first day 1, active {1};
    // u3 first day 0, active {0, 3}
    val e = ev(
      (1, 1, 0 * D + 5, "view", 1.0), (2, 1, 1 * D + 5, "view", 1.0),
      (3, 1, 3 * D + 5, "view", 1.0), (4, 1, 3 * D + 9, "click", 1.0),
      (5, 2, 1 * D + 5, "view", 1.0),
      (6, 3, 0 * D + 5, "view", 1.0), (7, 3, 3 * D + 5, "view", 1.0))
    val r = Analytics.cohortRetention(e, D).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 2L,
      (1L, 0L) -> 1L))
    // partitioning-independent
    val r2 = Analytics.cohortRetention(e.repartition(7), D).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r2 === r)
  }

  test("eventTransitions: consecutive pairs under the (ts, event_id) total order") {
    // u1: view -> click -> view; u2: view -> view (tie on ts broken by
    // event_id: 20 before 21)
    val e = ev(
      (1, 1, 100, "view", 1.0), (2, 1, 200, "click", 1.0),
      (3, 1, 300, "view", 1.0),
      (20, 2, 500, "view", 1.0), (21, 2, 500, "view", 1.0))
    val r = Analytics.eventTransitions(e).collect()
      .map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getLong(3)))).toMap
    assert(r === Map(
      ("view", "click") -> ((1L, 1L)),
      ("click", "view") -> ((1L, 1L)),
      ("view", "view") -> ((1L, 1L))))
  }

  test("scd2History: runs collapse, the last segment stays open") {
    val log = Seq(
      // key 1: A A B A  -> three segments (A, B, A)
      (1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"),
      (1L, 30L, 102L, "B"), (1L, 40L, 103L, "A"),
      // key 2: single run
      (2L, 10L, 200L, "C"), (2L, 50L, 201L, "C"))
      .toDF("k", "o", "tb", "a")
    val r = Analytics.scd2History(log, col("k"), col("o"), col("tb"), col("a"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]), x.getLong(4), x.getLong(5)))
      .sortBy(t => (t._1, t._6))
    assert(r === Seq(
      (1L, "A", 10L, Some(30L), 2L, 1L),
      (1L, "B", 30L, Some(40L), 1L, 2L),
      (1L, "A", 40L, None, 1L, 3L),
      (2L, "C", 10L, None, 2L, 1L)))
  }

  test("scd2History: same-order ties are pinned by the tiebreaker column") {
    // two observations at the same o; tb order decides the run shape
    val log = Seq((1L, 10L, 1L, "X"), (1L, 10L, 2L, "Y"))
      .toDF("k", "o", "tb", "a")
    val r = Analytics.scd2History(log, col("k"), col("o"), col("tb"), col("a"))
      .orderBy("seg").collect().map(_.getString(1))
    assert(r.toSeq === Seq("X", "Y"))
  }

  test("gapFillHourly: empty hours appear as zero rows, filled cells match the plain rollup") {
    val e = ev(
      (1, 1, 0 * H + 5, "view", 1.0),
      (2, 1, 0 * H + 9, "view", 2.0),
      (3, 2, 3 * H + 1, "view", 0.5),   // hours 1, 2 are gaps for view
      (4, 2, 2 * H + 1, "click", 4.0))  // click appears only in hour 2
    val r = Analytics.gapFillHourly(e).collect()
      .map(x => ((x.getString(0), x.getLong(1)), (x.getLong(2), x.getLong(3)))).toMap
    // full grid: 2 types x hours 0..3
    assert(r.size === 8)
    assert(r(("view", 0L)) === ((2L, 300L)))
    assert(r(("view", 1L)) === ((0L, 0L)))
    assert(r(("view", 2L)) === ((0L, 0L)))
    assert(r(("view", 3L)) === ((1L, 50L)))
    assert(r(("click", 2L)) === ((1L, 400L)))
    assert(r(("click", 0L)) === ((0L, 0L)))
  }

  test("skyline: matches naive dominance on anti-correlated data; bucket " +
    "width does not change the result") {
    // anti-correlated staircase + noise -> a large Pareto front, so the
    // bucket prefilter path is genuinely exercised
    val pts = (0 until 500).map { i =>
      val x = (i * 7919) % 1000
      val y = 1200 - x + (i * 104729) % 97   // strong anti-correlation
      (i.toLong, x.toLong, y.toLong)
    }
    val df = pts.toDF("id", "x", "y")
    // naive reference over distinct (x, y) with min id
    val dedup = pts.groupBy(p => (p._2, p._3)).map { case ((x, y), l) =>
      (l.map(_._1).min, x, y) }.toSeq
    val naive = dedup.filter { case (_, x, y) =>
      !dedup.exists { case (_, qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y) } }.toSet
    for (w <- Seq(1L, 4L, 64L, 100000L)) {
      val got = Analytics.skyline(df, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === naive, s"bucketWidth=$w")
    }
    assert(naive.size > 20, s"front too small to be a real test: ${naive.size}")
  }

  test("skyline: exact duplicates collapse to the min id") {
    val df = Seq((5L, 1L, 1L), (3L, 1L, 1L), (7L, 0L, 9L))
      .toDF("id", "x", "y")
    val got = Analytics.skyline(df, 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 1L, 1L), (7L, 0L, 9L)))
  }

  test("distanceJoin: matches the brute-force quadratic join, each pair once") {
    val pts = (0 until 300).map { i =>
      (i.toLong, ((i * 7919) % 200).toLong, ((i * 104729) % 150).toLong) }
    val df = pts.toDF("id", "x", "y")
    val r = 15L
    val naive = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield ((a._1, b._1), d2)).toMap
    val got = SpatialJoin.distanceJoin(df, r).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2)))
    assert(got.length === got.toMap.size, "duplicate pairs emitted")
    assert(got.toMap === naive)
    assert(naive.nonEmpty)
  }

  test("distanceJoin3: matches the brute-force quadratic join in 3-D") {
    val pts = (0 until 200).map { i =>
      (i.toLong, ((i * 7919) % 120).toLong, ((i * 104729) % 90).toLong,
        ((i * 31) % 100).toLong) }
    val df = pts.toDF("id", "x", "y", "t")
    val r = 25L
    val naive = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) +
        (a._4 - b._4) * (a._4 - b._4)
      if d2 <= r * r
    } yield ((a._1, b._1), d2)).toMap
    val got = SpatialJoin.distanceJoin3(df, r).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2)))
    assert(got.length === got.toMap.size, "duplicate pairs emitted")
    assert(got.toMap === naive)
    assert(naive.nonEmpty)
  }

  test("DataQuality: rule violations, duplicate keys, orphans each count exactly") {
    val fact = Seq(
      (1L, Some(10L), 5.0), (2L, Some(10L), -1.0),
      (3L, None, 2.0), (3L, Some(99L), 3.0))
      .toDF("id", "fk", "v")
    val dim = Seq(10L).toDF("d")
    val report = DataQuality.report(
      DataQuality.ruleViolations(fact, Seq(
        "fk_null" -> col("fk").isNull,
        "v_nonpos" -> (col("v") <= 0.0))),
      DataQuality.duplicateKeyCount(fact, col("id"), "id_dup"),
      DataQuality.orphanCount(fact, col("fk"), dim, col("d"), "fk_orphan"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(report === Map(
      "fk_null" -> 1L, "v_nonpos" -> 1L, "id_dup" -> 1L,
      // null fk never matches the dim -> counts as an orphan row
      "fk_orphan" -> 2L))
  }
}
