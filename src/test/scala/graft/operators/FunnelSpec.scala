package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "ts", "event_type")

  test("stage completion requires strict in-order progression") {
    val events = ev(
      // user 1: full funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE the first view only — stops at stage 1
      (2L, 5L, "click"), (2L, 10L, "view"),
      // user 3: view only
      (3L, 10L, "view"),
      // user 4: purchase lands before the click — stage 2 reached,
      // stage 3 not (no purchase after the click)
      (4L, 10L, "view"), (4L, 20L, "purchase"), (4L, 30L, "click"),
      // user 5: never viewed — not even stage 1
      (5L, 10L, "click"), (5L, 20L, "purchase"),
      // user 6: click at EXACTLY the view time — strict > excludes it
      (6L, 10L, "view"), (6L, 10L, "click"))
    val counts = Funnel.counts(events, stages).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts === Map(1 -> 5L, 2 -> 2L, 3 -> 1L))
  }

  test("stageTimes picks the FIRST qualifying event per stage") {
    val events = ev(
      (1L, 10L, "view"), (1L, 3L, "view"),       // first view = 3
      (1L, 5L, "click"), (1L, 8L, "click"),      // first click after 3 = 5
      (1L, 4L, "purchase"), (1L, 9L, "purchase")) // first purchase after 5 = 9
    val r = Funnel.stageTimes(events, stages).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 5L, 9L)))
  }

  test("funnel is monotone and partitioning-independent on the event fixture") {
    val events = graft.sources.EventTime.events(spark, sf())
    val counts = Funnel.counts(events, stages).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(counts.map(_._2).toSeq === stages)
    // each stage can only lose users
    assert(counts.sliding(2).forall {
      case Array(a, b) => b._3 <= a._3
      case _ => true
    })
    assert(counts.head._3 > 0)
    val rep = Funnel.counts(events.repartition(7), stages).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rep.toSeq === counts.toSeq)
  }
}
