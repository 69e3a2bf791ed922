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

  test("dangling redistribution conserves more mass and lifts every vertex") {
    val plain = LinkGraph.pageRank(edges, iters = 8).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val redis = LinkGraph.pageRank(edges, iters = 8, redistributeDangling = true)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    CheckpointScope.releaseAll()
    assert(redis.keySet === plain.keySet)
    // vertex 4 is dangling: its parked mass re-enters the system, so no
    // vertex loses rank and the total strictly grows (up to truncation)
    assert(redis.values.sum > plain.values.sum)
    assert(plain.keySet.forall(v => redis(v) >= plain(v)),
      s"plain=$plain redis=$redis")
    // order among the non-dangling spine is preserved
    assert(redis(0L) > redis(1L) && redis(1L) > redis(3L))
  }

  test("pageRankDelta shrinks as iterations converge") {
    def delta(iters: Int) =
      LinkGraph.pageRankDelta(edges, iters, redistributeDangling = true)
        .head().getLong(0)
    val d2 = delta(2); val d6 = delta(6)
    CheckpointScope.releaseAll()
    assert(d2 > 0L)
    assert(d6 < d2, s"d2=$d2 d6=$d6")
  }

  test("HITS: the universally-linked page is the top authority; its " +
    "in-linkers are hubs; scores are ∞-norm-capped at Scale") {
    val r = LinkGraph.hits(edges, iters = 6).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    CheckpointScope.releaseAll()
    assert(r.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // 0 is linked by 1,2,3 — the unique max authority (score = Scale)
    assert(r(0L)._1 === LinkGraph.Scale)
    assert(r.filter(_._1 != 0L).values.forall(_._1 < LinkGraph.Scale))
    // 1 and 3 each link authority 0 plus another page: the top hubs
    assert(r(1L)._2 === LinkGraph.Scale || r(3L)._2 === LinkGraph.Scale)
    // 4 is dangling (no out-edges): zero hub; nothing links 3: zero auth
    assert(r(4L)._2 === 0L)
    assert(r(3L)._1 === 0L)
    assert(r.values.forall { case (a, h) =>
      a >= 0L && a <= LinkGraph.Scale && h >= 0L && h <= LinkGraph.Scale })
  }

  test("HITS scores are partitioning-independent and release their rounds") {
    CheckpointScope.releaseAll()
    val a = LinkGraph.hits(edges, iters = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val live = CheckpointScope.liveCount
    CheckpointScope.releaseAll()
    val b = LinkGraph.hits(edges.repartition(5), iters = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    CheckpointScope.releaseAll()
    assert(a === b)
    // only the final round's auth + hub checkpoints outlive the call
    assert(live === 2, live.toString)
  }

  test("triangles: K4 counts, direction/multi-edge/self-loop immunity, none on a path") {
    // K4 on {0,1,2,3} has 4 triangles, every vertex in exactly 3 —
    // spelled with reversed duplicates, a parallel edge and a self
    // loop, none of which may change the count; 4-5-6-7 is a path
    // (triangle-free) and must not appear at all
    val e = Seq(
      (0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 1L),
      (1L, 3L), (2L, 3L), (3L, 3L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val r = LinkGraph.triangles(e).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // partitioning-independent
    val rep = LinkGraph.triangles(e.repartition(5)).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(rep === r)
  }

  test("triangles matches a naive adjacency-intersection reference on a hashed graph") {
    val e = (0L until 400L).flatMap { i =>
      Seq((i, (i * i + 7) % 400), (i, (i * 31 + 7) % 400), (i, i % 25))
    }.toDF("src", "dst")
    val got = LinkGraph.triangles(e).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    // naive: undirected adjacency sets, per-triple membership count
    val und = (0L until 400L).flatMap { i =>
      Seq((i, (i * i + 7) % 400), (i, (i * 31 + 7) % 400), (i, i % 25))
    }.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val adj = und.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- und; c <- adj(a).intersect(adj(b)); if a < b && b < c) {
      naive(a) += 1; naive(b) += 1; naive(c) += 1
    }
    assert(got === naive.toMap)
    assert(got.nonEmpty, "fixture produced no triangles")
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

  test("personalized PageRank: rank decays with distance from the seeds, " +
    "unreachable vertices score 0, rounds release") {
    import spark.implicits._
    // chain 0->1->2->3 seeded at 0, plus an isolated pair 10->11
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("v")
    CheckpointScope.releaseAll()
    val r = LinkGraph.personalizedPageRank(e, seeds, iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the walk teleports only to 0: each hop keeps the damped quotient,
    // so rank strictly decays along the chain after the seed
    assert(r(1L) > r(2L) && r(2L) > r(3L), r.toString)
    assert(r(0L) > 0L)
    // 10/11 are unreachable from the seed: no teleport mass, rank -> 0
    assert(r(10L) === 0L && r(11L) === 0L, r.toString)
    // partitioning-independent
    val r2 = LinkGraph.personalizedPageRank(e.repartition(7), seeds, iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 === r)
    CheckpointScope.releaseAll()
    val r3 = LinkGraph.personalizedPageRank(e, seeds, iters = 3)
    r3.count()
    assert(CheckpointScope.liveCount === 1, CheckpointScope.liveCount.toString)
    CheckpointScope.releaseAll()
  }

  test("seedDistance: exact hop labels, maxHops frontier cap, fixpoint stop") {
    import spark.implicits._
    // diamond + chain: 0 -> {1,2} -> 3 -> 4 -> 5; disconnected 10 -> 11
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("v")
    val full = LinkGraph.seedDistance(e, seeds)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(full === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L,
      4L -> 3L, 5L -> 4L))
    // the frontier cap truncates, never mislabels
    val capped = LinkGraph.seedDistance(e, seeds, maxHops = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(capped === full.filter(_._2 <= 2))
    // multi-source: nearest seed wins
    val ms = LinkGraph.seedDistance(e, Seq(0L, 4L).toDF("v"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(ms(4L) === 0L && ms(5L) === 1L && ms(3L) === 2L)
    CheckpointScope.releaseAll()
  }

  test("kCore matches a naive driver-side peel on a clique-plus-tendrils graph") {
    import spark.implicits._
    // K5 clique (ids 0-4), a path 5-6-7 hanging off vertex 0, and a
    // 4-cycle 10-11-12-13 bridged to the clique at 1
    val raw: Seq[(Long, Long)] =
      (for (a <- 0 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)) ++
        Seq((0L, 5L), (5L, 6L), (6L, 7L),
          (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L), (1L, 10L))
    val e = raw.toDF("src", "dst")
    def naive(k: Int): Map[Long, Long] = {
      var und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.filter(t => t._1 != t._2)
      var changed = true
      while (changed) {
        val deg = und.flatMap(t => Seq(t._1, t._2)).groupBy(identity)
          .map { case (v, l) => v -> l.size.toLong }
        val good = deg.filter(_._2 >= k).keySet
        val next = und.filter(t => good(t._1) && good(t._2))
        changed = next.size != und.size
        und = next
      }
      und.flatMap(t => Seq(t._1, t._2)).groupBy(identity)
        .map { case (v, l) => v -> l.size.toLong }
        .filter(_._2 >= k)
    }
    for (k <- 2 to 4) {
      val got = LinkGraph.kCore(e, k).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === naive(k), s"k=$k")
    }
    // k=2 keeps the cycle, k=3 peels it, k=4 leaves only the clique
    assert(LinkGraph.kCore(e, 2).count() === 9)  // clique + cycle
    assert(LinkGraph.kCore(e, 4).collect().map(_.getLong(0)).toSet ===
      Set(0L, 1L, 2L, 3L, 4L))
  }

  test("kTruss peels support-poor edges with cascade, matches a naive driver-side peel") {
    import spark.implicits._
    // K5 clique (support 3 per edge), a triangle 10-11-12 bridged to
    // the clique by ONE edge (0,10) (support 0 — peels immediately),
    // and a "book" 20-21 shared by two triangles (20,21,22)/(20,21,23)
    // whose spine has support 2 but whose page edges have support 1 —
    // at k=4 the pages peel round 1, which drops the spine's support
    // to 0 and peels it round 2 (the cascade k-core cannot express)
    val raw: Seq[(Long, Long)] =
      (for (a <- 0 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)) ++
        Seq((0L, 10L), (10L, 11L), (11L, 12L), (12L, 10L),
          (20L, 21L), (20L, 22L), (21L, 22L), (20L, 23L), (21L, 23L))
    val e = raw.toDF("src", "dst")
    def naive(k: Int, rounds: Int): Map[(Long, Long), Long] = {
      var und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.filter(t => t._1 != t._2)
      def sup(es: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
        val set = es.toSet
        es.map { case (a, b) =>
          (a, b) -> es.flatMap(t => Seq(t._1, t._2)).distinct.count(c =>
            c != a && c != b &&
              set((math.min(a, c), math.max(a, c))) &&
              set((math.min(b, c), math.max(b, c)))).toLong
        }.toMap
      }
      for (_ <- 0 until rounds) {
        val s = sup(und)
        und = und.filter(t => s(t) >= k - 2)
      }
      sup(und)
    }
    for (k <- Seq(3, 4, 5); rounds <- Seq(1, 2, 3)) {
      val got = LinkGraph.kTruss(e, k, rounds).collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
      assert(got === naive(k, rounds), s"k=$k rounds=$rounds")
    }
    // the cascade: k=4 round 1 keeps the book spine, round 2 peels it
    val r1 = LinkGraph.kTruss(e, 4, 1).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r1.contains((20L, 21L)))
    val r2 = LinkGraph.kTruss(e, 4, 2).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r2 === (for (a <- 0 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)).toSet)
    graft.operators.CheckpointScope.releaseAll()
  }

  test("kCore is direction/multi-edge/self-loop immune and releases its rounds") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = (base ++ base.map(_.swap) ++ Seq((1L, 1L), (2L, 2L)) ++ base)
      .toDF("src", "dst")
    CheckpointScope.releaseAll()
    val got = LinkGraph.kCore(noisy, 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // the fixpoint's surviving edge table is the only live checkpoint
    assert(CheckpointScope.liveCount === 1, CheckpointScope.liveCount.toString)
    CheckpointScope.releaseAll()
  }

  test("components labels every vertex with its component minimum, " +
    "treating edges as undirected") {
    import spark.implicits._
    // two components: a 4-cycle {1,2,3,4} (directed one way — the
    // symmetrization is the operator's job) and a path {10,11,12};
    // vertex 20 appears only as a dst and must still be labeled
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (11L, 10L), (11L, 12L), (12L, 20L)).toDF("src", "dst")
    val got = LinkGraph.components(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 10L))
    CheckpointScope.releaseAll()
  }

  test("cheapestPaths is bounded Bellman-Ford: a longer-hop cheaper " +
    "path improves a label after insertion") {
    import spark.implicits._
    // 0→1 w10 (direct); 0→2 w1, 2→3 w1, 3→1 w1 (3-hop detour cost 3);
    // plus a parallel 0→2 edge w5 that the min-reduction must drop
    val e = Seq((0L, 1L, 10L), (0L, 2L, 1L), (0L, 2L, 5L),
      (2L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("v")
    def run(r: Int) = LinkGraph.cheapestPaths(e, seeds, r).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 1 round: only direct edges — vertex 1 carries the expensive 10
    assert(run(1) === Map(0L -> 0L, 1L -> 10L, 2L -> 1L))
    CheckpointScope.releaseAll()
    // 2 rounds: the ≤2-edge paths — 1 still at 10 (detour needs 3 edges)
    assert(run(2) === Map(0L -> 0L, 1L -> 10L, 2L -> 1L, 3L -> 2L))
    CheckpointScope.releaseAll()
    // 3 rounds: the detour lands — 1 improves to 3 (BFS could never)
    assert(run(3) === Map(0L -> 0L, 1L -> 3L, 2L -> 1L, 3L -> 2L))
    CheckpointScope.releaseAll()
  }

  test("incrementalComponents equals a full recompute without the prior edges") {
    import spark.implicits._
    val priorEdges = Seq((1L, 2L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val prior = LinkGraph.components(priorEdges)
    // (2,3) merges two prior components; (5,6) is a brand-new pair;
    // (1,2) is intra-component and must be a no-op after contraction
    val newEdges = Seq((2L, 3L), (5L, 6L), (1L, 2L)).toDF("src", "dst")
    val got = LinkGraph.incrementalComponents(newEdges, prior).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 10L -> 10L, 11L -> 10L))
    // the load-bearing bit: vertex 4 touches NO new edge, yet its
    // label moved 3 -> 1 through the supernode relabel join
    CheckpointScope.releaseAll()
    // no cross-component new edges: prior labels pass through untouched
    val got2 = LinkGraph.incrementalComponents(
      Seq((1L, 2L)).toDF("src", "dst"), LinkGraph.components(priorEdges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L))
    CheckpointScope.releaseAll()
  }

  test("temporalReach only walks time-increasing edge sequences") {
    import spark.implicits._
    // seeds {0}, t0=0. (1,2,t=3) is time-BLOCKED (arrival at 1 is 5);
    // 2 is only reachable via 4 at arr=10; (3,5,t=8) improves 5's
    // direct arr=20 to 8 on the third round — later-start route,
    // earlier arrival (the label-improves-after-insertion case)
    val e = Seq((0L, 1L, 5L), (1L, 2L, 3L), (1L, 3L, 7L),
      (0L, 4L, 2L), (4L, 2L, 10L), (0L, 5L, 20L), (3L, 5L, 8L))
      .toDF("src", "dst", "t")
    val seeds = Seq(0L).toDF("v")
    def run(r: Int) = LinkGraph.temporalReach(e, seeds, 0L, r).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(1) === Map(0L -> 0L, 1L -> 5L, 4L -> 2L, 5L -> 20L))
    CheckpointScope.releaseAll()
    assert(run(2) === Map(0L -> 0L, 1L -> 5L, 4L -> 2L, 5L -> 20L,
      3L -> 7L, 2L -> 10L))
    CheckpointScope.releaseAll()
    assert(run(3) === Map(0L -> 0L, 1L -> 5L, 4L -> 2L, 5L -> 8L,
      3L -> 7L, 2L -> 10L))
    CheckpointScope.releaseAll()
    // static BFS over the same edges would reach 2 through 1 — the
    // temporal walk never does at any round count
    assert(run(6).get(2L) === Some(10L))
    CheckpointScope.releaseAll()
  }

  test("labelPropagation runs synchronous rounds with min-label ties") {
    import spark.implicits._
    // two triangles {0,1,2} and {3,4,5} bridged by 2–3; hand replay:
    //   r1: [1,0,0,2,3,3]  (v0's {1,2} tie -> 1; v3 sees {0,3,3} later)
    //   r2: [0,0,0,3,2,2]
    //   r3: [0,0,0,2,2,2]  -> stable from r4 on
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L)).toDF("src", "dst")
    // one round pins the SYNCHRONOUS update (an async sweep would
    // already have collapsed a triangle) and the smallest-label tie
    val r1 = LinkGraph.labelPropagation(e, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(r1 === Set((1L, 1L, 0L, 0L), (0L, 2L, 1L, 3L),
      (2L, 1L, 3L, 3L), (3L, 2L, 4L, 9L)))
    CheckpointScope.releaseAll()
    // four rounds: converged — one community per triangle
    val r4 = LinkGraph.labelPropagation(e, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(r4 === Set((0L, 3L, 0L, 3L), (2L, 3L, 3L, 12L)))
    CheckpointScope.releaseAll()
  }
}
