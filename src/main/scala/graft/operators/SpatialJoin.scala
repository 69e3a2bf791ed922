package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed rectangle×point spatial join — the set-oriented
 * generalization of the reference's single-rectangle range query
 * (`Client.java:76-83`): N query rectangles joined against the point
 * set in ONE pass, as an EQUI-join on grid cells instead of a
 * nested-loop over N range scans.
 *
 * Multi-level grid scheme (the quadtree-partition join of the spatial
 * engines, expressed relationally): a fixed ladder of cell sizes
 * (side 2^s for s ∈ [[Shifts]]); every point emits its containing
 * cell at EVERY level (|Shifts| rows — a constant blowup); every
 * rectangle emits its covering cells at exactly ONE level — the
 * finest whose cover stays within [[CellBudget]] cells, so small
 * rectangles probe tight cells while huge ones fall back to coarse
 * cells instead of exploding. A point lies in exactly one cell per
 * level, so a (point, rect) pair meets on at most one (s, cx, cy)
 * key — no post-join dedup. The exact BETWEEN predicate then filters
 * cover overshoot.
 *
 * Scale shape: the join is a plain equi-join on (s, cx, cy) — at
 * query-log rectangle counts the cell table broadcasts (zero shuffle
 * of the point side beyond the partial count); at corpus-scale
 * rectangle counts it degrades gracefully to a co-partitioned shuffle
 * join on the cell key. Never a nested-loop, never all-pairs.
 * Coordinates are assumed non-negative (the z-order domain).
 */
object SpatialJoin {

  /** Cell-side shifts, finest first (cell side 2^s). */
  val Shifts: Seq[Int] = Seq(4, 8, 12, 16)

  /** Max covering cells per rectangle before falling to a coarser level. */
  val CellBudget = 64

  /** Cover-size expression for a shift. */
  private def coverCnt(s: Int) =
    expr(s"((xmax div ${1L << s}) - (xmin div ${1L << s}) + 1) * " +
      s"((ymax div ${1L << s}) - (ymin div ${1L << s}) + 1)")

  /**
   * Rectangle cover: `(rect carry columns…, s, cx, cy)` — one row per
   * covering cell at the rectangle's chosen level. Input needs
   * `xmin/xmax/ymin/ymax` (integers).
   */
  def rectCells(rects: DataFrame): DataFrame = {
    val sCol = Shifts.init.foldRight(lit(Shifts.last)) { (s, coarser) =>
      when(coverCnt(s) <= CellBudget, lit(s)).otherwise(coarser)
    }
    rects.withColumn("s", sCol)
      .withColumn("cx",
        explode(expr("sequence(xmin div shiftleft(1, s), xmax div shiftleft(1, s))")))
      .withColumn("cy",
        explode(expr("sequence(ymin div shiftleft(1, s), ymax div shiftleft(1, s))")))
  }

  /** Point cells at every level: `(point carry columns…, s, cx, cy)`. */
  def pointCells(points: DataFrame): DataFrame =
    points.select(col("*"), explode(array(Shifts.map(s =>
        struct(lit(s).as("s"),
          expr(s"cast(x as bigint) div ${1L << s}").as("cx"),
          expr(s"cast(y as bigint) div ${1L << s}").as("cy"))): _*)).as("c"))
      .select(col("*"), col("c.s").as("s"), col("c.cx").as("cx"), col("c.cy").as("cy"))
      .drop("c")

  /**
   * The join: for every rectangle `(rect_id, xmin, xmax, ymin, ymax)`,
   * the count and id-sum of points `(id, x, y)` inside (inclusive
   * bounds) — `(rect_id, n_points, id_sum)`, zero-match rectangles
   * included. The id-sum pins the exact matched multiset, not just
   * its size.
   */
  def joinCount(points: DataFrame, rects: DataFrame): DataFrame = {
    val pc = pointCells(points.select(col("id"), col("x"), col("y")))
    val rc = rectCells(rects)
    val matched = pc.join(rc, Seq("s", "cx", "cy"))
      .filter(col("x").between(col("xmin"), col("xmax")) &&
        col("y").between(col("ymin"), col("ymax")))
      .groupBy("rect_id")
      .agg(count(lit(1)).as("n_points"), sum(col("id")).as("id_sum"))
    rects.select("rect_id").join(matched, Seq("rect_id"), "left")
      .select(col("rect_id"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }

  /**
   * Distance self-join: every unordered pair of points within Euclidean
   * distance `r` — the spatial near-duplicate / proximity-alert shape
   * (sensors within range, co-located records). The classic grid
   * method: with cell side `r`, any pair within distance `r` lies in
   * the same or an ADJACENT cell, so one side keeps its own cell and
   * the other emits its 3×3 neighborhood — the candidate generator is
   * a plain equi-join on the cell key, exact `dx²+dy² ≤ r²` verifies.
   *
   * Each unordered pair survives exactly once WITHOUT a distinct pass:
   * the neighborhood emission matches a given (a, b) orientation in
   * exactly one `(ox, oy)` offset, and the `id_a < id_b` filter keeps
   * one of the two orientations.
   *
   * Scale shape: one exchange per side on the cell key; candidate
   * volume is Σ_cells n(cell)·n(3×3 neighborhood) — local density
   * decides, never n². PRECONDITION: non-negative integer coordinates
   * (the store's 31-bit point domain) so truncating division is floor
   * division.
   *
   * Output: `(id_a, id_b, dist2)` with `dist2 = dx² + dy²`.
   */
  def distanceJoin(points: DataFrame, r: Long): DataFrame = {
    require(r >= 1)
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val left = p.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
      expr(s"div(x, $r)").as("cx"), expr(s"div(y, $r)").as("cy"))
    val offsets = array((for (ox <- -1 to 1; oy <- -1 to 1)
      yield struct(lit(ox.toLong).as("ox"), lit(oy.toLong).as("oy"))): _*)
    val right = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"))
      .withColumn("o", explode(offsets))
      .select(col("id_b"), col("xb"), col("yb"),
        (expr(s"div(xb, $r)") + col("o.ox")).as("cx"),
        (expr(s"div(yb, $r)") + col("o.oy")).as("cy"))
    left.join(right, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(r * r))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  /**
   * Spatial kNN JOIN within a radius — for EVERY point, its `k`
   * nearest OTHER points among those within Euclidean distance `r`,
   * in the deterministic `(dist2, id_b)` tie order the single-query
   * [[PointStore.knn]] uses. This is the per-row generalization the
   * reference's kNN verb lacks (one query point per call,
   * `Client.java:92-152`) and the workhorse of spatial blocking:
   * "k nearest stations/POIs/readings for every record" in one pass.
   *
   * The radius bound is what makes the join EXACT and scalable at
   * once: candidates come from the same 3×3 cell-neighborhood
   * equi-join as [[distanceJoin]] (cell side = `r`, so the
   * neighborhood provably covers the ball), and a per-key bounded
   * top-k aggregate (`collectTopK` — a size-k priority queue with
   * MAP-SIDE combine, the TakeOrdered shape as an aggregate) truncates
   * each point's candidate list to `k` before the reduce, so the
   * shuffle carries at most k·cells rows per point, never the full
   * candidate fan-out. A point with fewer than `k` in-radius
   * neighbors emits what it has (the radius contract, not a recall
   * loss). The final rank is a row_number over ≤ k-row groups that
   * reuses the aggregation's hash partitioning (no extra exchange).
   */
  def knnWithinJoin(points: DataFrame, r: Long, k: Int): DataFrame = {
    require(r >= 1 && k >= 1)
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val left = p.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
      expr(s"div(x, $r)").as("cx"), expr(s"div(y, $r)").as("cy"))
    val offsets = array((for (ox <- -1 to 1; oy <- -1 to 1)
      yield struct(lit(ox.toLong).as("ox"), lit(oy.toLong).as("oy"))): _*)
    val rightN = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"))
      .withColumn("o", explode(offsets))
      .select(col("id_b"), col("xb"), col("yb"),
        (expr(s"div(xb, $r)") + col("o.ox")).as("cx"),
        (expr(s"div(yb, $r)") + col("o.oy")).as("cy"))
    import org.apache.spark.sql.graftbridge.Bridge
    val cand = left.join(rightN, Seq("cx", "cy"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(r * r))
    cand.groupBy(col("id_a"))
      .agg(Bridge.collectTopK(Bridge.expression(
          struct(col("dist2").as("dist2"), col("id_b").as("id_b"))),
        k, reverse = true).as("top"))
      .select(col("id_a"), explode(col("top")).as("p"))
      .select(col("id_a"), col("p.id_b").as("id_b"), col("p.dist2").as("dist2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id_a"))
          .orderBy(col("dist2"), col("id_b"))).cast("long"))
  }

  /**
   * 3-D distance self-join — the spatio-temporal twin of
   * [[distanceJoin]] ("objects within range r of each other in space
   * AND time", the conflation/collision shape): cell side `r` in all
   * three axes, the neighborhood emission grows to 3×3×3 = 27 keys on
   * one side, everything else is the same equi-join + exact
   * `dx²+dy²+dt² ≤ r²` verify with the same exactly-once pair
   * accounting. Same non-negative-coordinate precondition.
   */
  def distanceJoin3(points: DataFrame, r: Long): DataFrame = {
    require(r >= 1)
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"),
      col("t").cast("long").as("t"))
    val left = p.select(col("id").as("id_a"), col("x").as("xa"),
      col("y").as("ya"), col("t").as("ta"),
      expr(s"div(x, $r)").as("cx"), expr(s"div(y, $r)").as("cy"),
      expr(s"div(t, $r)").as("ct"))
    val offsets = array((for (ox <- -1 to 1; oy <- -1 to 1; ot <- -1 to 1)
      yield struct(lit(ox.toLong).as("ox"), lit(oy.toLong).as("oy"),
        lit(ot.toLong).as("ot"))): _*)
    val right = p.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("t").as("tb"))
      .withColumn("o", explode(offsets))
      .select(col("id_b"), col("xb"), col("yb"), col("tb"),
        (expr(s"div(xb, $r)") + col("o.ox")).as("cx"),
        (expr(s"div(yb, $r)") + col("o.oy")).as("cy"),
        (expr(s"div(tb, $r)") + col("o.ot")).as("ct"))
    left.join(right, Seq("cx", "cy", "ct"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")) +
          (col("ta") - col("tb")) * (col("ta") - col("tb")))
      .filter(col("dist2") <= lit(r * r))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
