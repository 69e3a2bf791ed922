package graft.zorder

import scala.collection.mutable.ListBuffer

/**
 * Budgeted quad-tree decomposition of a 2-D rectangle into disjoint
 * z-key intervals — the engine's generalization of the reference's
 * index-probe pruning (`Index.java:144-164`): instead of the single
 * loose interval `[zorder(mins), zorder(maxs)]` (whose Z-shaped gap
 * regions are false positives, pruned there by the per-bucket
 * `intersect` test at `Index.java:159`), emit up to `maxRanges` tight
 * intervals whose union still covers the rectangle's entire z-image.
 *
 * Guarantees (property-tested in `ZRangesSpec`):
 *  - soundness: every point inside the rectangle has its z-key inside
 *    some emitted interval;
 *  - intervals are sorted, disjoint and non-adjacent (maximally merged);
 *  - count ≤ maxRanges;
 *  - all intervals lie within the loose `[zorder(min), zorder(max)]`.
 *
 * The budget keeps the predicate small enough to push down to Parquet
 * row-group filtering; when exhausted, a bucket is emitted whole —
 * conservative (superset), never lossy. Raw x/y predicates stay in every
 * query plan anyway (SURVEY §7.3), so false positives only cost I/O.
 */
object ZRanges {

  def decompose(rx: IntRange, ry: IntRange, maxRanges: Int = 16): Seq[(Long, Long)] = {
    require(maxRanges >= 1)
    def intersects(key: Long, pl: Int): Boolean = {
      val (bx, by) = ZOrder.bucketRect(key, pl)
      bx.intersect(rx) && by.intersect(ry)
    }
    def contained(key: Long, pl: Int): Boolean = {
      val (bx, by) = ZOrder.bucketRect(key, pl)
      rx.min <= bx.min && bx.max <= rx.max && ry.min <= by.min && by.max <= ry.max
    }
    val out = ListBuffer.empty[(Long, Long)] // final intervals, ascending
    def emit(key: Long, pl: Int): Unit = {
      val lo = ZOrder.bucketMin(key, pl); val hi = ZOrder.bucketMax(key, pl)
      out.lastOption match {
        case Some((plo, phi)) if phi + 1 == lo => out.update(out.length - 1, (plo, hi))
        case _ => out += ((lo, hi))
      }
    }
    // Depth-first work list, lower child first, so buckets finalize in
    // ascending z order. The budget counts FINAL intervals: a bucket
    // splits only while (finalized + pending + new children) fits the
    // budget; otherwise it is emitted whole — conservative, never lossy.
    // Root = the valid-domain quadrant (the top bit pair of any key from
    // non-negative 31-bit coordinates is 00; reference bootstrap,
    // Index.java:96-99).
    var work: List[(Long, Int)] = List((0L, 2)).filter(b => intersects(b._1, b._2))
    while (work.nonEmpty) {
      val (key, pl) = work.head
      work = work.tail
      if (contained(key, pl) || pl >= 64) emit(key, pl)
      else {
        val kids = Seq((key, pl + 1), (ZOrder.makeBit(key, pl), pl + 1))
          .filter(b => intersects(b._1, b._2))
        if (out.size + work.size + kids.size <= maxRanges) work = kids.toList ++ work
        else emit(key, pl)
      }
    }
    // Clamp to the loose interval [zorder(mins), zorder(maxs)]: every
    // in-rectangle z-key lies inside it (dominance monotonicity), so the
    // intersection stays a sound cover and is never worse than the naive
    // single-interval bound — even when the budget forced coarse buckets.
    val looseLo = ZOrder.zorder(rx.min, ry.min)
    val looseHi = ZOrder.zorder(rx.max, ry.max)
    out.toSeq
      .map { case (lo, hi) => (math.max(lo, looseLo), math.min(hi, looseHi)) }
      .filter { case (lo, hi) => lo <= hi }
  }
}
