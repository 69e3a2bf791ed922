package graft.zorder

import scala.collection.mutable.ListBuffer

/**
 * Budgeted OCTREE decomposition of a 3-D box into disjoint z3-key
 * intervals — [[ZRanges]] lifted to the spatio-temporal codec
 * ([[ZOrder3]]). Same guarantees, property-tested in `ZRanges3Spec`:
 * sound cover of the box's z3-image, sorted/disjoint/merged intervals,
 * count ≤ budget, all within the loose `[zorder3(mins), zorder3(maxs)]`
 * bound (dominance monotonicity holds per-dimension exactly as in 2-D).
 *
 * The root prefix is length 1: bit 63 of any valid key is 0 (21-bit
 * coordinates fill bits 62..0), so the length-1 bucket `0*` is the
 * whole valid domain — the 3-D analog of the 2-D valid-domain quadrant.
 */
object ZRanges3 {

  /** The box of the octree cell named by (key, prefixLen). */
  def bucketBox(key: Long, prefixLen: Int): (IntRange, IntRange, IntRange) = {
    val (xmin, ymin, tmin) = ZOrder3.unzorder3(ZOrder.bucketMin(key, prefixLen))
    val (xmax, ymax, tmax) = ZOrder3.unzorder3(ZOrder.bucketMax(key, prefixLen))
    (IntRange(xmin, xmax), IntRange(ymin, ymax), IntRange(tmin, tmax))
  }

  def decompose(rx: IntRange, ry: IntRange, rt: IntRange,
                maxRanges: Int = 16): Seq[(Long, Long)] = {
    require(maxRanges >= 1)
    def intersects(key: Long, pl: Int): Boolean = {
      val (bx, by, bt) = bucketBox(key, pl)
      bx.intersect(rx) && by.intersect(ry) && bt.intersect(rt)
    }
    def contained(key: Long, pl: Int): Boolean = {
      val (bx, by, bt) = bucketBox(key, pl)
      rx.min <= bx.min && bx.max <= rx.max &&
        ry.min <= by.min && by.max <= ry.max &&
        rt.min <= bt.min && bt.max <= rt.max
    }
    val out = ListBuffer.empty[(Long, Long)]
    def emit(key: Long, pl: Int): Unit = {
      val lo = ZOrder.bucketMin(key, pl); val hi = ZOrder.bucketMax(key, pl)
      out.lastOption match {
        case Some((plo, phi)) if phi + 1 == lo => out.update(out.length - 1, (plo, hi))
        case _ => out += ((lo, hi))
      }
    }
    var work: List[(Long, Int)] = List((0L, 1)).filter(b => intersects(b._1, b._2))
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
    val looseLo = ZOrder3.zorder3(rx.min, ry.min, rt.min)
    val looseHi = ZOrder3.zorder3(rx.max, ry.max, rt.max)
    out.toSeq
      .map { case (lo, hi) => (math.max(lo, looseLo), math.min(hi, looseHi)) }
      .filter { case (lo, hi) => lo <= hi }
  }
}
