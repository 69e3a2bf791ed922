package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  // a small asymmetric graph: 0 is a hub (everyone links it), 3 links
  // only onward, 4 is dangling
  private def edges = Seq(
    (1L, 0L), (2L, 0L), (3L, 0L), (1L, 2L), (3L, 4L), (0L, 1L))
    .toDF("src", "dst")

  test("hubs outrank leaves; every vertex appears; base floor holds") {
    val r = LinkGraph.pageRank(edges, iters = 8).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    CheckpointScope.releaseAll()
    assert(r.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(r(0L) > r(1L) && r(1L) > r(3L), r.toString)
    val base = (LinkGraph.DampDen - LinkGraph.DampNum) *
      LinkGraph.Scale / LinkGraph.DampDen
    assert(r.values.forall(_ >= base))
    // dangling-drop: total mass stays under n·Scale
    assert(r.values.sum <= 5L * LinkGraph.Scale)
  }

  test("ranks are partitioning-independent and repeatable") {
    val a = LinkGraph.pageRank(edges, iters = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = LinkGraph.pageRank(edges.repartition(7), iters = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    CheckpointScope.releaseAll()
    assert(a === b)
  }

  test("per-round checkpoints release as rounds supersede; only the " +
    "result's lineage stays registered") {
    CheckpointScope.releaseAll()
    val r = LinkGraph.pageRank(edges, iters = 6)
    r.count()
    // inputs + intermediate rounds released inside the operator: only
    // the final round's checkpoint remains
    assert(CheckpointScope.liveCount === 1, CheckpointScope.liveCount.toString)
    CheckpointScope.releaseAll()
    assert(CheckpointScope.liveCount === 0)
  }
}
