package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed q-digest behavior: compression semantics, mass
  * conservation, the ≤-τ non-leaf invariant, the post-order rank
  * query, and the merge law's error contract on real data. */
class QuantileSketchSpec extends SparkSpec {

  import QuantileSketch._

  test("compress keeps heavy sibling pairs and floats light mass to the root") {
    // leaves: 0→5, 1→1, 2→1, 3→10; τ=10.
    // round 0: pair (0,1) sums 6 ≤ 10 → parent (1,0)=6;
    //          pair (2,3) sums 11 > 10 → both stay as exact leaves.
    // (1,0)=6 then rises alone (6 ≤ 10 at every level) to the root.
    val leaves = Seq(Node(0, 0, 5), Node(0, 1, 1), Node(0, 2, 1), Node(0, 3, 10))
    val dg = compress(leaves, tau = 10)
    assert(dg.toSet === Set(Node(0, 2, 1), Node(0, 3, 10), Node(Levels, 0, 6)))
  }

  test("compress with τ below every pair sum is the identity") {
    val leaves = Seq(Node(0, 0, 5), Node(0, 1, 4), Node(0, 6, 9))
    assert(compress(leaves, tau = 3).toSet === leaves.toSet)
  }

  test("compress conserves mass and bounds every non-leaf node by τ") {
    val leaves = (0 until 300).map(i => Node(0, i * 7 % 4096, (i % 13 + 1).toLong))
      .groupBy(_.idx).map { case (idx, ns) => Node(0, idx, ns.map(_.cnt).sum) }.toSeq
    val n = leaves.map(_.cnt).sum
    val tau = 25L
    val dg = compress(leaves, tau)
    assert(dg.map(_.cnt).sum === n)
    assert(dg.filter(_.lvl > 0).forall(_.cnt <= tau),
      "every pushed node was admitted under τ and never grows")
  }

  test("quantileAt walks nodes in post-order (upper asc, level asc)") {
    val dg = Seq(Node(0, 2, 1), Node(0, 3, 10), Node(Levels, 0, 6))
    // cumulative: ub2→1, ub3→11, ub65535→17
    assert(quantileAt(dg, 1) === 2)
    assert(quantileAt(dg, 5) === 3)
    assert(quantileAt(dg, 11) === 3)
    assert(quantileAt(dg, 12) === 65535)
  }

  test("targetRank is ceil(φ·n/100)") {
    assert(targetRank(50, 101) === 51)
    assert(targetRank(1, 100) === 1)
    assert(targetRank(99, 100) === 99)
    assert(targetRank(99, 1) === 1)
  }

  test("digestTable + quantileProbe satisfy the Levels·τ contract on events") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .select(col("event_id"), expr("cast(round(value*100) as bigint)").as("cents"))
    val n = ev.count()
    val dgRows = digestTable(ev, "cents").collect()
    assert(dgRows.map(_.getLong(2)).sum === n, "digest mass = corpus mass")
    val tau = tauFor(n)
    assert(dgRows.filter(_.getInt(0) > 0).forall(_.getLong(2) <= tau))
    val probe = quantileProbe(ev, "cents").collect()
    assert(probe.length === Phis.length)
    assert(probe.forall(_.getBoolean(6)), "every φ within Levels·τ ranks")
  }

  test("merge law: split digests re-compressed answer within the compounded bound") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .select(col("event_id"), expr("cast(round(value*100) as bigint)").as("cents"))
    val probe = mergeProbe(ev, "cents", "event_id").collect()
    assert(probe.length === Phis.length)
    assert(probe.forall(_.getBoolean(6)), "merged digest still within bound")
    // and the merged digest's target n is the full corpus
    assert(probe.head.getLong(1) === ev.count())
  }

  test("rangeCountProbe: estimates within 2·Levels·τ, exact on leaf-aligned data") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .select(col("event_id"), expr("cast(round(value*100) as bigint)").as("cents"))
    val rows = rangeCountProbe(ev, "cents",
      Seq((0L, 65535L), (10000L, 30000L), (60000L, 65000L))).collect()
    // full-universe range: estimate == exact == n (no straddle at all)
    assert(rows(0).getLong(2) === ev.count())
    assert(rows(0).getLong(3) === rows(0).getLong(2))
    assert(rows.forall(_.getBoolean(6)))
    // range past the data max: exact 0, estimate within bound
    assert(rows(2).getLong(2) === 0L)
    // inverted ranges are a loud contract violation, not a silent -n
    assertThrows[IllegalArgumentException] {
      rangeCountProbe(ev, "cents", Seq((200L, 100L)))
    }
  }

  test("quantilesByGroup: independent per-group digests, all within bound") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .select(col("event_type"), expr("cast(round(value*100) as bigint)").as("cents"))
    val rows = quantilesByGroup(ev, "event_type", "cents").collect()
    val groups = ev.select("event_type").distinct().count()
    assert(rows.length === groups * Phis.length)
    assert(rows.forall(_.getBoolean(7)), "every (group, φ) within its own Levels·τ")
    // per-group n must be the group's row count, not the corpus's
    val ns = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val expected = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ns === expected)
  }

  test("probes of an empty corpus return an empty report, not a crash") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("cents", LongType))))
    assert(quantileProbe(empty, "cents").count() === 0L)
    assert(rangeCountProbe(empty, "cents", Seq((0L, 100L))).count() === 1L)
    assert(digestTable(empty, "cents").count() === 0L)
  }

  test("compression is deterministic: same multiset, same digest") {
    val leaves = (0 until 500).map(i => Node(0, (i * 31) % Universe, (i % 7 + 1).toLong))
      .groupBy(_.idx).map { case (idx, ns) => Node(0, idx, ns.map(_.cnt).sum) }.toSeq
    val a = compress(scala.util.Random.shuffle(leaves), 40L)
    val b = compress(leaves.reverse, 40L)
    assert(a === b)
  }
}
