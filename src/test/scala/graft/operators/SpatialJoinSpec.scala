package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random points and rectangles spanning sizes
  // from a few cells to thousands (forcing every grid level)
  private def pts(n: Int) = (0 until n)
    .map(i => (i.toLong, (i * 7919) % 40000, (i * 104729) % 500))
    .toDF("id", "x", "y")

  private def rects(n: Int) = (0 until n).map { i =>
    val xmin = (i * 9973) % 35000; val ymin = (i * 31) % 400
    (i.toLong, xmin, xmin + 10 + (i % 23) * 800, ymin, ymin + 1 + (i % 11) * 30)
  }.toDF("rect_id", "xmin", "xmax", "ymin", "ymax")

  test("joinCount equals the naive quadratic definition, zero-match rects included") {
    val p = pts(5000); val r = rects(40)
    val got = SpatialJoin.joinCount(p, r).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val naive = r.collect().map { row =>
      val (id, xmin, xmax, ymin, ymax) = (row.getLong(0), row.getInt(1),
        row.getInt(2), row.getInt(3), row.getInt(4))
      val in = pts(5000).collect().filter(q =>
        q.getInt(1) >= xmin && q.getInt(1) <= xmax &&
          q.getInt(2) >= ymin && q.getInt(2) <= ymax)
      id -> (in.length.toLong, in.map(_.getLong(0)).sum)
    }.toMap
    assert(got.keySet === naive.keySet)
    naive.foreach { case (id, (n, s)) =>
      assert(got(id) === ((n, s)), s"rect $id")
    }
  }

  test("rectangle covers stay within the cell budget at the chosen level") {
    val rc = SpatialJoin.rectCells(rects(40))
      .groupBy("rect_id").agg(countDistinct(struct(col("cx"), col("cy"))).as("cells"),
        first(col("s")).as("s")).collect()
    rc.foreach { row =>
      val cells = row.getLong(1)
      // coarsest-level fallback may exceed the budget; any finer level must not
      if (row.getInt(2) != SpatialJoin.Shifts.last)
        assert(cells <= SpatialJoin.CellBudget, s"rect ${row.getLong(0)}: $cells")
    }
    // the size spread must actually exercise more than one level
    assert(rc.map(_.getInt(2)).distinct.length >= 2)
  }

  test("results are partitioning-independent") {
    val a = SpatialJoin.joinCount(pts(3000), rects(25)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val b = SpatialJoin.joinCount(pts(3000).repartition(7), rects(25).repartition(3))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(a === b)
  }

  test("knnWithinJoin matches the brute-force windowed definition, ties and short lists included") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // clustered points force dist2 ties (integer grid) and an isolated
    // outlier pins the fewer-than-k contract
    val rows = (0L until 400L).map(i =>
      (i, (rnd.nextInt(60) + 5).toLong, (rnd.nextInt(60) + 5).toLong)) :+
      ((400L, 5000L, 5000L)) :+ ((401L, 5007L, 5000L))
    val df = rows.toDF("id", "x", "y")
    val r = 9L
    val k = 4
    val got = SpatialJoin.knnWithinJoin(df, r, k).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    // brute force: all in-radius pairs, rank by (dist2, id_b), keep k
    val brute = (for {
      (ia, xa, ya) <- rows
      (ib, xb, yb) <- rows if ia != ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r * r
    } yield (ia, ib, d2))
      .groupBy(_._1).toSeq.flatMap { case (ia, cands) =>
        cands.sortBy(c => (c._3, c._2)).take(k).zipWithIndex
          .map { case ((_, ib, d2), i) => (ia, ib, d2, (i + 1).toLong) }
      }.toSet
    assert(got === brute)
    // the isolated pair: exactly one neighbor each (radius contract)
    assert(got.count(_._1 == 400L) === 1)
    assert(got.exists(t => t._1 == 400L && t._2 == 401L && t._3 == 49L && t._4 == 1L))
  }
}
