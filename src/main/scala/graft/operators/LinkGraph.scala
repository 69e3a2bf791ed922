package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CheckpointScope.Scoped

/**
 * Link-graph centrality for crawl/corpus quality — the signal web-scale
 * curation ranks domains and pages by (CommonCrawl publishes exactly
 * this; PageRank, Page et al. 1999, is the classic form). Computed in
 * exact FIXED-POINT integer arithmetic so every iteration — and the
 * final ranks — hash-match a DuckDB replay:
 *
 *  - ranks carry in units of 1e-6 (`Scale`); damping is the exact
 *    RATIONAL `dampNum/dampDen` (default 17/20 = the canonical 0.85) —
 *    a small-denominator rational instead of a ×1e6 factor keeps the
 *    largest intermediate at `dampNum · totalMass`, which stays inside
 *    a Long up to ~5×10^11 vertices at this Scale (a ×1e6 damping
 *    factor overflows past ~10^4 vertices);
 *  - one iteration, per SOURCE u: `qd(u) = (p(u) // outdeg(u)) · 17 // 20`
 *    (both truncations once per source, so they are well-defined and
 *    engine-order-free), then `p'(v) = base + Σ_{u→v} qd(u)` with
 *    `base = (dampDen−dampNum)·Scale // dampDen`;
 *  - dangling-node mass (no out-edges) is dropped, the standard
 *    simplification (ranks then sum to slightly under `n·Scale`, which
 *    a consumer ranking BY the value never notices).
 *
 * Scale shape: the classic two-shuffle power iteration — join the rank
 * table with out-degrees and the edge list on the source key, sum
 * contributions on the destination key. Ranks localCheckpoint per
 * round (lineage otherwise deepens by two joins per iteration); each
 * superseded round releases immediately, the final table on result
 * materialization ([[CheckpointScope]]). Iterations are a fixed small
 * constant — rank ORDER stabilizes long before values converge.
 */
object LinkGraph {

  /** Fixed-point rank unit (1e-6 of a unit rank). */
  val Scale = 1000000L

  /** Damping 17/20 — the canonical 0.85 as an exact rational. */
  val DampNum = 17L
  val DampDen = 20L

  /**
   * Integer PageRank over an edge list `(src, dst)` (Long vertex ids;
   * parallel edges each contribute — pre-`distinct` if that is not
   * intended). Returns `(v, rank)` for every vertex appearing as a
   * source or destination.
   *
   * With `redistributeDangling`, the mass parked on dangling vertices
   * (no out-edges) is NOT dropped: each iteration adds the damped
   * per-vertex share `((D // n) · dampNum) // dampDen` of the dangling
   * mass `D = Σ_{u dangling} p(u)` to every vertex — the standard
   * stochastic-matrix completion, as a per-iteration 1-row aggregate
   * broadcast into the rank update (both truncations once globally, so
   * the spelling is engine-order-free and oracle-replayable). Cost: one
   * extra metadata-scale aggregate per round; the two corpus-scale
   * shuffles per iteration are unchanged.
   */
  def pageRank(edges: DataFrame, iters: Int = 5, dampNum: Long = DampNum,
               dampDen: Long = DampDen,
               redistributeDangling: Boolean = false): DataFrame =
    iterate(edges, iters, dampNum, dampDen, redistributeDangling,
      keepPrev = false)._1

  /**
   * Convergence probe: the L1 rank movement `Σ_v |p_T(v) − p_{T−1}(v)|`
   * of the FINAL iteration, as a 1-row table `(l1_delta)` — the
   * quantity an early-stopping production run thresholds on (rank
   * order stabilizes when it collapses). Same iteration core as
   * [[pageRank]]; the second-to-last round's table is retained one
   * round longer and the delta is one extra metadata-scale aggregate.
   */
  def pageRankDelta(edges: DataFrame, iters: Int = 5, dampNum: Long = DampNum,
                    dampDen: Long = DampDen,
                    redistributeDangling: Boolean = false): DataFrame = {
    val (p, prev) = iterate(edges, iters, dampNum, dampDen,
      redistributeDangling, keepPrev = true)
    p.alias("a").join(prev.alias("b"), col("a.v") === col("b.v"))
      .agg(sum(abs(col("a.rank") - col("b.rank"))).as("l1_delta"))
  }

  /** The shared power-iteration core; returns (final ranks, previous
    * round's ranks — the initial table when `iters == 1`). */
  private def iterate(edges: DataFrame, iters: Int, dampNum: Long,
                      dampDen: Long, redistributeDangling: Boolean,
                      keepPrev: Boolean): (DataFrame, DataFrame) = {
    require(iters >= 1)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .scopedCheckpoint()
    val verts = e.select(explode(array(col("src"), col("dst"))).as("v"))
      .distinct() // one edge pass, not one per endpoint branch (r19)
      .scopedCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .scopedCheckpoint()
    // checkpointed, so joins against p (also verts-derived) can never
    // trip self-join column ambiguity
    val dangling = if (!redistributeDangling) null
      else verts.join(outdeg, verts("v") === outdeg("src"), "left_anti")
        .scopedCheckpoint()
    val nverts = if (!redistributeDangling) null
      else verts.agg(count(lit(1)).as("n"))
    val base = (dampDen - dampNum) * Scale / dampDen
    var p = verts.select(col("v"), lit(Scale).as("rank"))
    var prev: DataFrame = p
    var pCk: DataFrame = null    // newest checkpoint (= p's table)
    var prevCk: DataFrame = null // one older, retained only if keepPrev
    var t = 0
    while (t < iters) {
      // damped per-source quotient FIRST (truncations once per u),
      // then fan out along edges and sum per destination
      val qd = p.join(outdeg, p("v") === outdeg("src"))
        .select(p("v").as("u"),
          expr(s"div(div(rank, outdeg) * $dampNum, $dampDen)").as("qd"))
      val contrib = qd.join(e, col("u") === e("src"))
        .groupBy(col("dst")).agg(sum(col("qd")).as("c"))
      val next0 = verts.join(contrib, verts("v") === contrib("dst"), "left")
        .select(verts("v"),
          (lit(base) + coalesce(col("c"), lit(0L))).as("rank"))
      val next = (if (!redistributeDangling) next0
        else {
          val dmass = p.join(dangling, p("v") === dangling("v"))
            .agg(coalesce(sum(col("rank")), lit(0L)).as("d"))
          val share = dmass.crossJoin(nverts)
            .select(expr(s"div(div(d, n) * $dampNum, $dampDen)").as("s"))
          next0.crossJoin(broadcast(share))
            .select(col("v"), (col("rank") + col("s")).as("rank"))
        }).scopedCheckpoint()
      if (keepPrev) {
        if (prevCk != null) CheckpointScope.release(prevCk)
        prevCk = pCk
      } else if (pCk != null) CheckpointScope.release(pCk)
      pCk = next
      prev = p
      p = next
      t += 1
    }
    // inputs are superseded once the final ranks are materialized data;
    // the live rounds' checkpoints are the RESULT's lineage and stay
    // registered for the caller's release point
    CheckpointScope.release(e)
    CheckpointScope.release(outdeg)
    CheckpointScope.release(verts)
    if (dangling != null) CheckpointScope.release(dangling)
    (p, prev)
  }

  /**
   * HITS hubs & authorities (Kleinberg 1999) in exact fixed-point
   * integers — PageRank's companion centrality: authorities are pages
   * many hubs point AT, hubs are pages pointing at many authorities.
   * Per iteration (Kleinberg's original order): `auth_raw(v) =
   * Σ_{u→v} hub(u)` from the PREVIOUS hubs, then `hub_raw(u) =
   * Σ_{u→v} auth(v)` from the NEW auths; each vector is rescaled to
   * `max = Scale` (the ∞-norm — a single 1-row aggregate broadcast;
   * engine-order-free because the one truncating division happens once
   * per vertex against one global max). The rescale product is widened
   * to DECIMAL(38,0) / HUGEINT, so `raw · Scale` cannot overflow at any
   * in-degree — raw itself is bounded by `maxdeg · Scale` which holds
   * a Long to ~9×10^12 in-edges per vertex.
   *
   * Returns `(v, auth, hub)` for every vertex. Scale shape: two wide
   * shuffles per iteration (sum per dst, sum per src) + two 1-row
   * maxes, lineage checkpoint-released per round exactly like
   * [[pageRank]]. Vertices with no in-edges score auth 0; no
   * out-edges, hub 0.
   */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .scopedCheckpoint()
    val verts = e.select(explode(array(col("src"), col("dst"))).as("v"))
      .distinct() // one edge pass, not one per endpoint branch (r19)
      .scopedCheckpoint()
    def rescale(raw: DataFrame, out: String): DataFrame = {
      val m = raw.agg(max(col("raw")).as("m"))
      verts.join(raw, Seq("v"), "left").crossJoin(broadcast(m))
        .select(col("v"), coalesce(
          expr(s"cast((cast(raw as decimal(38,0)) * $Scale) div m as bigint)"),
          lit(0L)).as(out))
    }
    var h = verts.select(col("v"), lit(Scale).as("hub"))
    var a: DataFrame = null
    var hCk: DataFrame = null
    var aCk: DataFrame = null
    var t = 0
    while (t < iters) {
      val araw = h.join(e, h("v") === e("src"))
        .groupBy(e("dst")).agg(sum(col("hub")).as("raw"))
        .select(col("dst").as("v"), col("raw"))
      val aNext = rescale(araw, "auth").scopedCheckpoint()
      val hraw = aNext.join(e, aNext("v") === e("dst"))
        .groupBy(e("src")).agg(sum(col("auth")).as("raw"))
        .select(col("src").as("v"), col("raw"))
      val hNext = rescale(hraw, "hub").scopedCheckpoint()
      if (aCk != null) CheckpointScope.release(aCk)
      if (hCk != null) CheckpointScope.release(hCk)
      aCk = aNext; hCk = hNext
      a = aNext; h = hNext
      t += 1
    }
    val out = a.join(h, Seq("v")).select(col("v"), col("auth"), col("hub"))
    CheckpointScope.release(e)
    CheckpointScope.release(verts)
    out
  }

  /**
   * The unrolled-iteration DuckDB oracle twin of [[hits]] over an edge
   * CTE named `edges(src, dst)`: CTE chain `h0, a1, h1 … a$iters,
   * h$iters`; append a SELECT joining `a$iters` and `h$iters`.
   */
  def hitsOracleCore(iters: Int = 5): String = {
    // every CTE is MATERIALIZED: each round references the previous
    // one twice (the raw sum and the 1-row max), so DuckDB's default
    // inlining would expand the chain EXPONENTIALLY — 2^iters scans of
    // the edge fixture blows the process file-handle budget before it
    // blows the planner
    val head =
      s"""verts AS MATERIALIZED (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
h0 AS MATERIALIZED (SELECT v, CAST($Scale AS BIGINT) AS hub FROM verts)"""
    val rounds = (1 to iters).map { t =>
      s"""ar$t AS MATERIALIZED (SELECT e.dst AS v, CAST(sum(h.hub) AS BIGINT) AS raw
  FROM h${t - 1} h JOIN edges e ON e.src = h.v GROUP BY e.dst),
am$t AS MATERIALIZED (SELECT max(raw) AS m FROM ar$t),
a$t AS MATERIALIZED (SELECT v.v, CAST(coalesce((CAST(r.raw AS HUGEINT) * $Scale) // am.m, 0) AS BIGINT) AS auth
  FROM verts v LEFT JOIN ar$t r ON r.v = v.v, am$t am),
hr$t AS MATERIALIZED (SELECT e.src AS v, CAST(sum(a.auth) AS BIGINT) AS raw
  FROM a$t a JOIN edges e ON e.dst = a.v GROUP BY e.src),
hm$t AS MATERIALIZED (SELECT max(raw) AS m FROM hr$t),
h$t AS MATERIALIZED (SELECT v.v, CAST(coalesce((CAST(r.raw AS HUGEINT) * $Scale) // hm.m, 0) AS BIGINT) AS hub
  FROM verts v LEFT JOIN hr$t r ON r.v = v.v, hm$t hm)"""
    }
    (head +: rounds).mkString(",\n")
  }

  /**
   * The unrolled-iteration DuckDB oracle over an edge CTE named
   * `edges(src, dst)`: CTE chain `p0 … p$iters(v, rank)`; append a
   * SELECT against `p$iters`. With `dangling`, each round folds in the
   * damped per-vertex dangling-mass share exactly as [[pageRank]]
   * spells it.
   */
  def oracleCore(iters: Int = 5, dampNum: Long = DampNum,
                 dampDen: Long = DampDen, dangling: Boolean = false): String = {
    val base = (dampDen - dampNum) * Scale / dampDen
    val head =
      s"""verts AS (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
p0 AS (SELECT v, CAST($Scale AS BIGINT) AS rank FROM verts)""" +
      (if (!dangling) "" else s""",
dang AS (SELECT v.v FROM verts v
  WHERE NOT EXISTS (SELECT 1 FROM odeg o WHERE o.src = v.v)),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts)""")
    val rounds = (1 to iters).map { t =>
      val qc =
        s"""q$t AS (SELECT p.v, CAST(((p.rank // o.outdeg) * $dampNum) // $dampDen AS BIGINT) AS qd
  FROM p${t - 1} p JOIN odeg o ON o.src = p.v),
c$t AS (SELECT e.dst, CAST(sum(q.qd) AS BIGINT) AS c
  FROM q$t q JOIN edges e ON e.src = q.v GROUP BY e.dst)"""
      if (!dangling)
        s"""$qc,
p$t AS (SELECT v.v, CAST($base + coalesce(c.c, 0) AS BIGINT) AS rank
  FROM verts v LEFT JOIN c$t c ON c.dst = v.v)"""
      else
        s"""$qc,
d$t AS (SELECT CAST(coalesce(sum(p.rank), 0) AS BIGINT) AS d
  FROM p${t - 1} p JOIN dang ON dang.v = p.v),
s$t AS (SELECT CAST(((d.d // nv.n) * $dampNum) // $dampDen AS BIGINT) AS s FROM d$t d, nv),
p$t AS (SELECT v.v, CAST($base + s.s + coalesce(c.c, 0) AS BIGINT) AS rank
  FROM verts v LEFT JOIN c$t c ON c.dst = v.v, s$t s)"""
    }
    (head +: rounds).mkString(",\n")
  }

  /**
   * Personalized PageRank / TrustRank (Gyöngyi, Garcia-Molina &
   * Pedersen 2004): the random walk TELEPORTS only to the `seeds` —
   * rank flows outward from a curated trust set, so pages reachable
   * from trusted hubs score high and isolated link farms decay
   * geometrically with distance from the seeds. The seed-propagation
   * tool crawl curation uses to demote spam neighborhoods.
   *
   * Exact integer spelling, engine-order-free like [[pageRank]]: total
   * mass `n·Scale` concentrates on the seeds — per-seed initial mass
   * `m = n·Scale // |S|` and per-seed teleport base
   * `((dampDen−dampNum)·m) // dampDen`, non-seeds carry base 0; each
   * iteration is the same damped out-degree quotient + destination
   * sum. Seed count and vertex count are DRIVER-side scalars (a trust
   * seed set is curated metadata, never corpus-scale). Overflow
   * margin: the largest intermediate is `dampNum · n·Scale`, the same
   * bound as [[pageRank]] (~5×10^11 vertices at this Scale).
   *
   * Two corpus-scale shuffles per iteration; per-round checkpoint
   * release identical to [[pageRank]]. Returns `(v, rank)`; vertices
   * unreachable from the seeds converge to 0.
   */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 5, dampNum: Long = DampNum,
                           dampDen: Long = DampDen): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .scopedCheckpoint()
    val verts = e.select(explode(array(col("src"), col("dst"))).as("v"))
      .distinct() // one edge pass, not one per endpoint branch (r19)
      .scopedCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .scopedCheckpoint()
    // seeds absent from the graph contribute no mass: the left join
    // marks in-graph seeds (sv non-null), so the per-seed quotient
    // n·Scale/|S| conserves total mass exactly as the oracle (which
    // defines seeds as a subset of verts) does. ONE checkpoint job
    // materializes the flagged vertex table; |V| and |S∩V| then come
    // from ONE aggregate over it (round-14: the separate sd.count +
    // verts.count actions were two extra full jobs before the loop)
    val sd = seeds.select(col("v").cast("long").as("sv")).distinct()
    val flagged = verts.join(sd, verts("v") === sd("sv"), "left")
      .select(verts("v"), col("sv"))
      .scopedCheckpoint()
    val cnt = flagged.agg(count(lit(1)).as("nv"), count(col("sv")).as("ns")).head()
    val (nV, nS) = (cnt.getLong(0), cnt.getLong(1))
    require(nS >= 1, "personalizedPageRank needs a non-empty in-graph seed set")
    val seedMass = Scale * nV / nS
    val seedBase = (dampDen - dampNum) * seedMass / dampDen
    val init = flagged.select(col("v"),
      when(col("sv").isNotNull, lit(seedMass)).otherwise(lit(0L)).as("rank"),
      when(col("sv").isNotNull, lit(seedBase)).otherwise(lit(0L)).as("base"))
    var p = init.select(col("v"), col("rank"))
    var pCk: DataFrame = null
    var t = 0
    while (t < iters) {
      val qd = p.join(outdeg, p("v") === outdeg("src"))
        .select(p("v").as("u"),
          expr(s"div(div(rank, outdeg) * $dampNum, $dampDen)").as("qd"))
      val contrib = qd.join(e, col("u") === e("src"))
        .groupBy(col("dst")).agg(sum(col("qd")).as("c"))
      val next = init.select(col("v"), col("base"))
        .join(contrib, init("v") === contrib("dst"), "left")
        .select(init("v"), (col("base") + coalesce(col("c"), lit(0L))).as("rank"))
        .scopedCheckpoint()
      if (pCk != null) CheckpointScope.release(pCk)
      pCk = next
      p = next
      t += 1
    }
    CheckpointScope.release(e)
    CheckpointScope.release(outdeg)
    CheckpointScope.release(verts)
    CheckpointScope.release(flagged)
    p
  }

  /**
   * DuckDB twin of [[personalizedPageRank]] over an edge CTE
   * `edges(src, dst)`: seeds selected by `seedPred` (a SQL predicate
   * over the vertex column `v`), `iters` unrolled rounds ending in
   * `pp$iters(v, rank)`.
   */
  def personalizedOracleCore(iters: Int, seedPred: String,
                             dampNum: Long = DampNum,
                             dampDen: Long = DampDen): String = {
    val head =
      s"""verts AS (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
sds AS (SELECT v FROM verts WHERE $seedPred),
sm AS (SELECT CAST(($Scale * (SELECT count(*) FROM verts)) // (SELECT count(*) FROM sds) AS BIGINT) AS m),
sb AS (SELECT CAST((${dampDen - dampNum} * m) // $dampDen AS BIGINT) AS b FROM sm),
pinit AS (SELECT v.v,
    CASE WHEN s.v IS NOT NULL THEN sm.m ELSE 0 END AS rank,
    CASE WHEN s.v IS NOT NULL THEN sb.b ELSE 0 END AS base
  FROM verts v LEFT JOIN sds s ON s.v = v.v, sm, sb),
pp0 AS (SELECT v, CAST(rank AS BIGINT) AS rank FROM pinit)"""
    val rounds = (1 to iters).map { t =>
      s"""pq$t AS (SELECT p.v, CAST(((p.rank // o.outdeg) * $dampNum) // $dampDen AS BIGINT) AS qd
  FROM pp${t - 1} p JOIN odeg o ON o.src = p.v),
pc$t AS (SELECT e.dst, CAST(sum(q.qd) AS BIGINT) AS c
  FROM pq$t q JOIN edges e ON e.src = q.v GROUP BY e.dst),
pp$t AS (SELECT i.v, CAST(i.base + coalesce(c.c, 0) AS BIGINT) AS rank
  FROM pinit i LEFT JOIN pc$t c ON c.dst = i.v)"""
    }
    (head +: rounds).mkString(",\n")
  }

  /**
   * Hop distance from a seed set (multi-source BFS over the DIRECTED
   * edge list): the "link distance from trusted pages" companion to
   * [[personalizedPageRank]] — crawl-depth auditing, frontier
   * scheduling, and the integer feature TrustRank's geometric decay
   * approximates. Returns `(v, dist)` for every vertex REACHABLE
   * within `maxHops`; unreachable vertices are absent.
   *
   * Frontier relaxation: each round joins the current distance table
   * along edges and keeps the minimum — distances only decrease, and
   * a round that changes nothing is the fixpoint (diameter-bounded,
   * `maxHops` also caps the answer by construction). Two shuffles per
   * round (edge join + min rollup), per-round checkpoint release —
   * the same lineage discipline as every iterative operator here.
   */
  def seedDistance(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int = 16): DataFrame = {
    require(maxHops >= 0)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().scopedCheckpoint()
    var dist = seeds.select(col("v").cast("long").as("v")).distinct()
      .select(col("v"), lit(0L).as("dist")).scopedCheckpoint()
    var n = dist.count()
    var hop = 0
    var converged = false
    while (!converged && hop < maxHops) {
      val relaxed = dist.join(e, dist("v") === e("src"))
        .select(e("dst").as("v"), (col("dist") + 1L).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("v")).agg(min(col("dist")).as("dist"))
        .scopedCheckpoint()
      val nNext = next.count()
      CheckpointScope.release(dist)
      // unit-weight BFS invariant: a vertex first appears in the table
      // at exactly its true hop distance, and a label never changes
      // after insertion — so an unchanged ROW COUNT is the fixpoint
      converged = nNext == n
      dist = next
      n = nNext
      hop += 1
    }
    CheckpointScope.release(e)
    dist
  }

  /**
   * DuckDB twin of [[seedDistance]] over an edge CTE `edges(src,
   * dst)`: `rounds` unrolled relaxations (gate fixtures must converge
   * within them), ending in `sd$rounds(v, dist)`.
   */
  def seedDistanceOracleCore(rounds: Int, seedPred: String): String = {
    val head =
      s"""dverts AS (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
de AS (SELECT DISTINCT src, dst FROM edges),
sd0 AS (SELECT v, CAST(0 AS BIGINT) AS dist FROM dverts WHERE $seedPred)"""
    val steps = (1 to rounds).map { t =>
      s"""sd$t AS (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
  SELECT v, dist FROM sd${t - 1}
  UNION ALL
  SELECT e.dst AS v, d.dist + 1 AS dist FROM sd${t - 1} d JOIN de e ON e.src = d.v
) GROUP BY v)"""
    }
    (head +: steps).mkString(",\n")
  }

  /**
   * Weighted cheapest paths from a seed set — BOUNDED Bellman–Ford
   * (Bellman 1958): after exactly `rounds` relaxations, the label of
   * `v` is the cheapest total weight among seed→v paths of at most
   * `rounds` edges — the classic Bellman–Ford loop invariant promoted
   * to the operator contract, so the result is well-defined on ANY
   * graph with no fixpoint requirement (compare [[seedDistance]]'s
   * unit-weight fixpoint + `maxHops` cap: there a label is final on
   * insertion; here a longer-hop but cheaper path CAN improve an
   * existing label, so row-count stability is NOT convergence and the
   * loop deliberately runs all `rounds` rounds). Weights are
   * non-negative integers; costs exact Longs — hash-replayable.
   *
   * Parallel edges are reduced to their minimum weight BEFORE the
   * rounds (one aggregation; provably result-identical, and it keeps
   * the per-round join fan-out at one row per simple edge).
   * Scale shape: per round, one equi-join shuffle (labels × edges on
   * the source key) and a min aggregation on the vertex key;
   * per-round checkpoints released as superseded — the [[iterate]]
   * budget.
   *
   * SEED CONTRACT (shared with [[temporalReach]]): `seeds` may name
   * any vertex ids, and an isolated seed (absent from every edge
   * endpoint) is a valid output row with cost 0 — but the DuckDB twin
   * ([[cheapestPathsOracleCore]]) derives its seed set from EDGE
   * ENDPOINTS matching `seedPred`, so an oracle-gated fixture must
   * seed only vertices that appear in the edge list; seeding an
   * absent vertex diverges from the oracle by that one seed row.
   */
  def cheapestPaths(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("long"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .scopedCheckpoint()
    var dist = seeds.select(col("v").cast("long").as("v")).distinct()
      .select(col("v"), lit(0L).as("cost")).scopedCheckpoint()
    var r = 0
    while (r < rounds) {
      val relaxed = dist.join(e, dist("v") === e("src"))
        .select(e("dst").as("v"), (col("cost") + col("w")).as("cost"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("v")).agg(min(col("cost")).as("cost"))
        .scopedCheckpoint()
      CheckpointScope.release(dist)
      dist = next
      r += 1
    }
    CheckpointScope.release(e)
    dist
  }

  /**
   * DuckDB twin of [[cheapestPaths]] over an edge CTE
   * `edges(src, dst, w)`: `rounds` unrolled weighted relaxations over
   * the min-reduced edge set, ending in `cp$rounds(v, cost)`.
   */
  def cheapestPathsOracleCore(rounds: Int, seedPred: String): String = {
    val head =
      s"""cpverts AS (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
cpe AS MATERIALIZED (SELECT src, dst, min(w) AS w FROM edges GROUP BY 1, 2),
cp0 AS (SELECT v, CAST(0 AS BIGINT) AS cost FROM cpverts WHERE $seedPred)"""
    val steps = (1 to rounds).map { t =>
      s"""cp$t AS MATERIALIZED (SELECT v, CAST(min(cost) AS BIGINT) AS cost FROM (
  SELECT v, cost FROM cp${t - 1}
  UNION ALL
  SELECT e.dst AS v, d.cost + e.w AS cost FROM cp${t - 1} d JOIN cpe e ON e.src = d.v
) GROUP BY v)"""
    }
    (head +: steps).mkString(",\n")
  }

  /**
   * Time-respecting reachability over a TEMPORAL edge list
   * `(src, dst, t)` — earliest-arrival relaxation (Holme & Saramäki's
   * temporal-network reachability; the influence/contact-tracing
   * primitive): a temporal edge is traversable only if its timestamp
   * is at or after the traverser's arrival at its source, so
   * `arrival(v)` = the earliest time any seed can reach `v` along a
   * TIME-INCREASING edge sequence — static reachability over the same
   * edges overcounts (it happily walks backward in time). Seeds start
   * at `t0`. Bounded to `rounds` relaxations, the [[cheapestPaths]]
   * contract: after round R, labels are exact over sequences of ≤ R
   * edges (earliest arrival is monotone non-increasing per round, and
   * an inserted label CAN improve via a later-start but
   * earlier-arriving route). Exact integer timestamps.
   *
   * Scale shape: per round one equi-join shuffle (labels × temporal
   * edges on the source key) with the time-respect predicate applied
   * BEFORE the min aggregation on the vertex key — the join fans out
   * per temporal edge, so multi-edge (u,v) pairs stay unreduced (each
   * timestamp is a distinct traversal opportunity; reducing them,
   * unlike [[cheapestPaths]]' min-weight reduction, would be WRONG
   * when a smaller t precedes the arrival at u).
   *
   * Seed contract: same as [[cheapestPaths]] — isolated seeds emit
   * `(v, t0)`, but [[temporalReachOracleCore]] seeds from edge
   * endpoints only, so oracle-gated fixtures must seed edge-incident
   * vertices.
   */
  def temporalReach(edges: DataFrame, seeds: DataFrame, t0: Long,
                    rounds: Int): DataFrame = {
    require(rounds >= 0)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("t").cast("long"))
      .distinct().scopedCheckpoint()
    var arr = seeds.select(col("v").cast("long").as("v")).distinct()
      .select(col("v"), lit(t0).as("arr")).scopedCheckpoint()
    var r = 0
    while (r < rounds) {
      val relaxed = arr.join(e, arr("v") === e("src") && e("t") >= col("arr"))
        .select(e("dst").as("v"), e("t").as("arr"))
      val next = arr.unionByName(relaxed)
        .groupBy(col("v")).agg(min(col("arr")).as("arr"))
        .scopedCheckpoint()
      CheckpointScope.release(arr)
      arr = next
      r += 1
    }
    CheckpointScope.release(e)
    arr
  }

  /**
   * DuckDB twin of [[temporalReach]] over an edge CTE
   * `edges(src, dst, t)`: `rounds` unrolled earliest-arrival
   * relaxations, ending in `tr$rounds(v, arr)`.
   */
  def temporalReachOracleCore(rounds: Int, seedPred: String,
                              t0: Long): String = {
    val head =
      s"""trverts AS (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
tre AS MATERIALIZED (SELECT DISTINCT src, dst, t FROM edges),
tr0 AS (SELECT v, CAST($t0 AS BIGINT) AS arr FROM trverts WHERE $seedPred)"""
    val steps = (1 to rounds).map { r =>
      s"""tr$r AS MATERIALIZED (SELECT v, CAST(min(arr) AS BIGINT) AS arr FROM (
  SELECT v, arr FROM tr${r - 1}
  UNION ALL
  SELECT e.dst AS v, e.t AS arr FROM tr${r - 1} d JOIN tre e
    ON e.src = d.v AND e.t >= d.arr
) GROUP BY v)"""
    }
    (head +: steps).mkString(",\n")
  }

  /**
   * Per-vertex triangle counts over the UNDIRECTED simple graph
   * underlying `(src, dst)` — the local-clustering signal of link-spam
   * and community detection (triangles are what separates an organic
   * neighborhood from a star-shaped link farm).
   *
   * Algorithm: degree-ordered wedge closure (the "compact-forward" /
   * node-iterator++ scheme, Latapy 2008; also Suri & Vassilvitskii
   * 2011 for the MapReduce shape). Each undirected edge is ORIENTED
   * from its lower endpoint to its higher by the total order
   * `(degree, id)`; every triangle then has exactly one source vertex
   * with two out-edges, so
   *
   *   wedges:   e1(u→x) ⋈ e2(u→y) on u, with ord(x) < ord(y)
   *   closure:  wedge(u,x,y) ⋈ oriented edge (x→y)
   *
   * enumerates each triangle EXACTLY once. The orientation is the
   * scale guarantee: out-degrees under (deg, id) order are bounded by
   * O(√m) on any graph (arboricity bound), so a 10^6-follower hub
   * generates no 10^12-wedge blowup — its edges all point INTO it.
   * Three equality-join shuffles total; never a cartesian.
   *
   * Returns `(v, n_tri)` for every vertex in ≥ 1 triangle.
   */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val tri = triangleEnum(und)
    // one corner row per triangle corner via explode — the 3-way union
    // of projections spelled the SAME rows but re-ran the wedge join
    // once per branch (r19: 3 triangleEnum evaluations → 1)
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
  }

  /** Degree-ordered triangle enumeration over a canonical undirected
    * edge set `(a < b)`: one row `(u, x, y)` per triangle, each
    * enumerated once from its lowest-(deg, id) corner — the O(√m)
    * out-degree bound that keeps hub vertices from a wedge blowup.
    * Shared by [[triangles]] and the [[kTruss]] peel rounds. */
  private def triangleEnum(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d")) // one edge pass (r19)
    // orient a—b from lower (deg, id) to higher; carry the head's
    // order key for the wedge comparison
    val orient = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("w"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("db").as("d"), col("b").as("i")))
          .otherwise(struct(col("da").as("d"), col("a").as("i")))
          .as("word"))
    val e1 = orient.select(col("u"), col("w").as("x"), col("word").as("xord"))
    val e2 = orient.select(col("u"), col("w").as("y"), col("word").as("yord"))
    val wedges = e1.join(e2, Seq("u")).filter(col("xord") < col("yord"))
      .select(col("u"), col("x"), col("y"))
    wedges.join(
      orient.select(col("u").as("x"), col("w").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
  }

  /**
   * k-truss peeling, BOUNDED rounds (Cohen 2008): each round computes
   * every surviving edge's triangle SUPPORT (triangles through it in
   * the surviving subgraph) and deletes edges with support < k−2;
   * after exactly `rounds` peels the surviving edges are returned with
   * their final-subgraph support. The k-truss is the edge-analog of
   * [[kCore]] and the sharper dense-kernel signal (every edge must sit
   * in k−2 triangles — chains, stars, and bipartite-ish link farms
   * peel even where degrees stay high). Fixed rounds is the operator
   * contract, like [[cheapestPaths]]: the oracle unrolls the same
   * rounds, and a fixture converging within them makes the bounded
   * result THE k-truss; the engine result is well-defined either way.
   *
   * Scale shape: per round one degree-ordered triangle enumeration
   * (the [[triangleEnum]] O(√m) wedge bound), one edge-keyed support
   * aggregate (map-side combinable), one left join + filter; per-round
   * checkpoint with the superseded round released — lineage one round
   * deep, the [[kCore]] discipline.
   */
  def kTruss(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 2 && rounds >= 0)
    var e = trussInit(edges)
    var r = 0
    while (r < rounds) {
      val next = trussPeelOnce(e, k)
      CheckpointScope.release(e)
      e = next
      r += 1
    }
    e.join(trussSupport(e), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Canonical undirected-edge table the truss peel starts from. */
  private def trussInit(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct().scopedCheckpoint()

  /** Per-edge triangle support in the surviving subgraph. */
  private def trussSupport(e: DataFrame): DataFrame = {
    val tri = triangleEnum(e)
    // one side row per triangle side via explode — the 3-way union
    // re-ran the wedge join once per branch, i.e. 3× PER PEEL ROUND
    // (r19: 3 triangleEnum evaluations per round → 1)
    tri.select(explode(array(
        struct(least(col("u"), col("x")).as("a"),
          greatest(col("u"), col("x")).as("b")),
        struct(least(col("u"), col("y")).as("a"),
          greatest(col("u"), col("y")).as("b")),
        struct(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b")))).as("s"))
      .select(col("s.a").as("a"), col("s.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
  }

  /** One support-peel round, checkpointed. */
  private def trussPeelOnce(e: DataFrame, k: Int): DataFrame =
    e.join(trussSupport(e), Seq("a", "b"), "left")
      .filter(coalesce(col("support"), lit(0L)) >= k - 2)
      .select(col("a"), col("b")).scopedCheckpoint()

  /**
   * [[kTruss]]'s convergence signal — one row per peel round,
   * `(round, peeled, surviving)` — so a caller choosing `rounds` can
   * SEE whether the bounded peel CONVERGED (the last round peeled 0
   * edges, making the bounded result THE k-truss) or was truncated
   * mid-peel and needs more rounds: the [[pageRankDelta]] discipline
   * applied to the edge-peel loop. Costs [[kTruss]]'s per-round work
   * plus one count per round over the already-checkpointed edge set
   * (a driver-side integer per round — nothing collects).
   */
  def kTrussPeelTrace(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 2 && rounds >= 1)
    val session = edges.sparkSession
    var e = trussInit(edges)
    var n = e.count()
    val trace = Seq.newBuilder[(Long, Long, Long)]
    var r = 0
    while (r < rounds) {
      val next = trussPeelOnce(e, k)
      val nn = next.count()
      trace += ((r + 1L, n - nn, nn))
      CheckpointScope.release(e)
      e = next; n = nn; r += 1
    }
    CheckpointScope.release(e)
    import session.implicits._
    trace.result().toDF("round", "peeled", "surviving")
  }

  /**
   * DuckDB twin of [[kTruss]] over an edge CTE named `edges(src, dst)`:
   * `rounds` unrolled support-peel rounds (simple a<b<c triangle
   * enumeration — support is orientation-independent, so the oracle
   * needn't replay the engine's degree ordering), ending in
   * `kt$rounds(a, b)` plus the final support table `ts$rounds(u, v,
   * sup)`. MATERIALIZED per round: each round's edge table is
   * referenced four times.
   */
  def kTrussOracleCore(k: Int, rounds: Int): String = {
    def supSql(i: Int) =
      s"""tt$i AS MATERIALIZED (SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM kt$i e1 JOIN kt$i e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN kt$i e3 ON e3.a = e1.b AND e3.b = e2.b),
ts$i AS MATERIALIZED (SELECT u, v, CAST(count(*) AS BIGINT) AS sup FROM
  (SELECT a AS u, b AS v FROM tt$i
   UNION ALL SELECT a AS u, c AS v FROM tt$i
   UNION ALL SELECT b AS u, c AS v FROM tt$i) GROUP BY u, v)"""
    val head =
      """kt0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst)"""
    val steps = (0 until rounds).map { i =>
      s"""${supSql(i)},
kt${i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM kt$i e
  LEFT JOIN ts$i s ON s.u = e.a AND s.v = e.b
  WHERE coalesce(s.sup, 0) >= ${k - 2})"""
    }
    ((head +: steps) :+ supSql(rounds)).mkString(",\n")
  }

  /**
   * DuckDB twin of [[triangles]] over an edge CTE named
   * `edges(src, dst)`: CTE chain ending in `tri(u, x, y)` (one row per
   * triangle); append an aggregate over the unioned vertex columns.
   */
  def trianglesOracleCore: String =
    """und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
tdeg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
  (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
orient AS (SELECT
    CASE WHEN (da.d, und.a) < (db.d, und.b) THEN und.a ELSE und.b END AS u,
    CASE WHEN (da.d, und.a) < (db.d, und.b) THEN und.b ELSE und.a END AS w,
    CASE WHEN (da.d, und.a) < (db.d, und.b) THEN db.d ELSE da.d END AS wd
  FROM und JOIN tdeg da ON da.v = und.a JOIN tdeg db ON db.v = und.b),
tri AS (SELECT e1.u, e1.w AS x, e2.w AS y
  FROM orient e1 JOIN orient e2 ON e1.u = e2.u AND (e1.wd, e1.w) < (e2.wd, e2.w)
  JOIN orient c ON c.u = e1.w AND c.w = e2.w)"""

  /**
   * k-core decomposition by iterative peeling (Seidman 1983; the
   * degree-threshold fixpoint): repeatedly delete every vertex whose
   * degree in the SURVIVING undirected subgraph is below `k` until no
   * deletion fires. The k-core is the standard "dense kernel" signal
   * crawl-graph curation uses to separate genuinely interlinked
   * communities from chains and tendrils (which peel away).
   *
   * Returns `(v, deg)` — each surviving vertex with its core-subgraph
   * degree (all ≥ k by the fixpoint).
   *
   * Scale shape: each round is one partial-aggregatable degree rollup
   * plus two SEMI joins of the edge table against the survivor set —
   * never wider than the shrinking edge list. Rounds are bounded by
   * the graph's peeling depth (`maxRounds` is a runaway backstop, not
   * a tuning knob); every round's edge table is checkpointed and the
   * superseded round released, so lineage stays one round deep exactly
   * like [[pageRank]]. The per-round convergence probe reads one
   * COUNT off the just-materialized checkpoint — no extra pass.
   */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    require(k >= 1)
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("deg")) // one edge pass (r19)
    var und = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .scopedCheckpoint()
    var nEdges = und.count()
    var round = 0
    var converged = nEdges == 0L
    while (!converged && round < maxRounds) {
      val good = degrees(und).filter(col("deg") >= k).select(col("v"))
        .scopedCheckpoint()
      val next = und
        .join(good, und("a") === good("v"), "left_semi")
        .join(good, und("b") === good("v"), "left_semi")
        .scopedCheckpoint()
      val nNext = next.count()
      CheckpointScope.release(good)
      CheckpointScope.release(und)
      converged = nNext == nEdges
      und = next
      nEdges = nNext
      round += 1
    }
    // a maxRounds exit without a fixpoint would return a SUPERSET of the
    // k-core with inflated degrees — refuse to hand that back silently
    if (!converged) throw new IllegalStateException(
      s"kCore(k=$k) did not reach its peeling fixpoint in $maxRounds rounds " +
        s"($nEdges edges still shrinking); raise maxRounds")
    degrees(und).filter(col("deg") >= k)
  }

  /**
   * DuckDB twin of [[kCore]] over an edge CTE named `edges(src, dst)`:
   * `rounds` UNROLLED peel rounds (the oracle cannot iterate to a
   * data-dependent fixpoint; a gate using this must pin that its
   * fixture converges within `rounds` — [[kCore]] itself always runs
   * to the true fixpoint). CTE chain ends in `ke$rounds(a, b)`; append
   * a degree aggregate filtered to ≥ k.
   */
  /**
   * First-class connected components over a DIRECTED edge list
   * `(src, dst)`, treated as undirected: `(v, component)` for every
   * vertex, `component` = minimum vertex id reachable in its
   * component (the deterministic canonical label). This is the same
   * min-label hooking + pointer jumping engine [[Dedup
   * .connectedComponents]] runs under every near-dup cluster
   * resolution — exposed directly because users reach for CC as a
   * graph primitive (site clusters, link farms, crawl partitions),
   * not only through the dedup API. O(log d) rounds for a diameter-d
   * component, two vertex-keyed shuffles per round, lineage one
   * round deep — the [[pageRank]] hygiene.
   */
  def components(edges: DataFrame): DataFrame =
    Dedup.connectedComponents(
      edges.select(col("src").cast("long").as("id_a"),
        col("dst").cast("long").as("id_b")))
      .select(col("doc_id").as("v"), col("cluster_id").as("component"))

  /**
   * INCREMENTAL connected components — fold a batch of NEW edges into
   * PRIOR component labels without touching the full historical edge
   * set (the nightly-graph analog of `dedup_incremental`: at 100 TB
   * the accumulated link graph is re-derivable but re-flooding it
   * nightly is not affordable; the merge information lives entirely in
   * the new edges).
   *
   * Supernode contraction: each new edge projects its endpoints onto
   * their prior component labels (an unseen vertex maps to itself),
   * intra-component edges drop as self-loops, and [[Dedup.connectedComponents]]
   * runs on the CONTRACTED graph — whose size is bounded by the new
   * batch, never the corpus. The result maps old labels to merged
   * labels; composition relabels prior vertices in one join.
   *
   * Exactness: labels are component-minimum vertex ids, so the merged
   * supernode minimum = min over member supernodes' labels = min over
   * all member VERTEX ids — precisely the full-recompute label
   * (the `cc_incremental` gate checks against the full-union oracle).
   *
   * Scale shape: two broadcast-or-shuffle lookups of the new edges
   * against the prior label table (at 100 TB: the label table is
   * vertex-scale — bucket it by `v` and the lookups co-locate), the
   * O(log d) flood on the batch-bounded contracted graph, then ONE
   * label-keyed join to relabel. The prior×prior quadrant is never
   * read, let alone flooded.
   */
  def incrementalComponents(newEdges: DataFrame, prior: DataFrame): DataFrame = {
    val lab = prior.select(col("v").cast("long").as("v"),
      col("component").cast("long").as("component")).scopedCheckpoint()
    val e = newEdges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val projected = e
      .join(lab.select(col("v").as("src"), col("component").as("ca")),
        Seq("src"), "left")
      .join(lab.select(col("v").as("dst"), col("component").as("cb")),
        Seq("dst"), "left")
      .select(coalesce(col("ca"), col("src")).as("id_a"),
        coalesce(col("cb"), col("dst")).as("id_b"))
    val merged = Dedup.connectedComponents(
        projected.filter(col("id_a") =!= col("id_b")))
      .select(col("doc_id").as("c_old"), col("cluster_id").as("c_new"))
    // coverage = prior vertices + every new-edge endpoint (new vertices
    // start as their own components, exactly like a fresh flood)
    val newVerts = e.select(explode(array(col("src"), col("dst"))).as("v"))
      .distinct() // one edge pass (r19)
      .join(lab.select("v"), Seq("v"), "left_anti")
      .withColumn("component", col("v"))
    // lab stays registered (3 readers in this lineage) — the caller's
    // CheckpointScope release point frees it with the result
    lab.unionByName(newVerts)
      .join(merged, col("component") === col("c_old"), "left")
      .select(col("v"), coalesce(col("c_new"), col("component")).as("component"))
  }

  /**
   * Synchronous label-propagation communities (Raghavan–Albert–Kumara
   * 2007) — the near-linear community detector web curation uses to
   * group pages into topical/site clusters where [[components]] is too
   * coarse (everything reachable collapses) and modularity solvers too
   * expensive. Runs EXACTLY `rounds` synchronous rounds: every vertex
   * simultaneously adopts the label with the highest incidence among
   * its neighbors' PREVIOUS-round labels (self-label excluded), ties
   * broken to the smallest label. The fixed round count is part of the
   * operator contract, like [[pageRank]]'s — synchronous LPA can
   * 2-cycle on bipartite structure, so a fixpoint test would be
   * unsound; callers pick `rounds` ≈ expected community diameter.
   *
   * Determinism: labels are vertex ids, counts exact integers, and the
   * per-vertex argmax is `max(struct(count, −label))` — one aggregate
   * with map-side partials, no window, no float, so the result
   * hash-matches the oracle's unrolled replay at any partitioning.
   *
   * Scale shape: per round, ONE shuffle joining the previous labels
   * along the symmetrized edge list (keyed on the neighbor end) and a
   * two-level same-key aggregation on the vertex key; the edge list is
   * checkpointed once and reused, labels localCheckpoint per round
   * with the superseded round released immediately (the [[iterate]]
   * convention — ≤ 2 label tables resident at any time). Output is the
   * community roster `(community, n_members, min_v, v_sum)` — `v_sum`
   * pins the exact member multiset.
   */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().scopedCheckpoint()
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("label", col("v")).scopedCheckpoint()
    var prevCk = labels
    var r = 0
    while (r < rounds) {
      val next = lpaRound(sym, labels)
        .scopedCheckpoint() // eager: prevCk is safe to drop now
      CheckpointScope.release(prevCk)
      prevCk = next
      labels = next
      r += 1
    }
    CheckpointScope.release(sym)
    labels.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_v"),
        sum(col("v")).as("v_sum"))
  }

  /** One synchronous LPA round: neighbor-label tallies along the
    * symmetrized edges, then the per-vertex `max(struct(c, −label))`
    * argmax — exposed for the plan-quality pin (the loop checkpoints
    * each round, so the round's shape is invisible in the final plan). */
  private[graft] def lpaRound(sym: DataFrame, labels: DataFrame): DataFrame =
    sym.join(labels, sym("dst") === labels("v"))
      .groupBy(sym("src").as("u"), col("label"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("u"))
      .agg(max(struct(col("c"), (-col("label")).as("neg"))).as("m"))
      .select(col("u").as("v"), (-col("m.neg")).as("label"))

  /**
   * DuckDB twin of [[labelPropagation]] over an edge CTE
   * `edges(src, dst)`: `rounds` unrolled synchronous updates, each a
   * grouped neighbor-label count with a `QUALIFY` argmax (count DESC,
   * label ASC — the engine's `max(struct(c, −label))` spelled as a
   * window). Chain ends in `lp$rounds(v, label)`.
   */
  def lpaOracleCore(rounds: Int): String = {
    val head =
      """le AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION ALL SELECT dst AS src, src AS dst FROM edges WHERE src <> dst)),
lverts AS (SELECT DISTINCT src AS v FROM le),
lp0 AS (SELECT v, v AS label FROM lverts)"""
    val steps = (1 to rounds).map { t =>
      s"""lp$t AS MATERIALIZED (
  SELECT e.src AS v, l.label AS label, count(*) AS c
  FROM le e JOIN lp${t - 1} l ON e.dst = l.v
  GROUP BY 1, 2
  QUALIFY row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, l.label) = 1)"""
    }
    (head +: steps).mkString(",\n")
  }

  /**
   * DuckDB twin of [[components]] over an edge CTE `edges(src, dst)`:
   * `rounds` unrolled min-label relaxations over the SYMMETRIZED edge
   * set (the oracle floods the minimum one hop per round where the
   * engine pointer-jumps in O(log d); a gate's fixture must converge
   * within `rounds`). Chain ends in `cc$rounds(v, label)`.
   */
  def ccOracleCore(rounds: Int): String = {
    val head =
      """cverts AS (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
ce AS MATERIALIZED (SELECT DISTINCT src, dst FROM
  (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges)),
cc0 AS (SELECT v, v AS label FROM cverts)"""
    val steps = (1 to rounds).map { t =>
      s"""cc$t AS MATERIALIZED (SELECT v, min(label) AS label FROM (
  SELECT v, label FROM cc${t - 1}
  UNION ALL
  SELECT e.dst AS v, l.label FROM cc${t - 1} l JOIN ce e ON e.src = l.v
) GROUP BY v)"""
    }
    (head +: steps).mkString(",\n")
  }

  def kCoreOracleCore(k: Int, rounds: Int): String = {
    // MATERIALIZED: each round's edge table is referenced four times
    // (twice in its degree rollup, twice in the next round's filter) —
    // DuckDB's default inlining would otherwise expand the chain
    // exponentially (and re-open the base parquet per reference)
    val head =
      """ke0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst)"""
    val steps = (0 until rounds).map { i =>
      s"""kg$i AS MATERIALIZED (SELECT v FROM
  (SELECT v, count(*) AS d FROM
    (SELECT a AS v FROM ke$i UNION ALL SELECT b AS v FROM ke$i) GROUP BY v)
  WHERE d >= $k),
ke${i + 1} AS MATERIALIZED (SELECT a, b FROM ke$i
  WHERE a IN (SELECT v FROM kg$i) AND b IN (SELECT v FROM kg$i))"""
    }
    (head +: steps).mkString(",\n")
  }
}
