package graft.operators

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("RRF: doc in both lists outranks a better single-list doc") {
    // doc 7 is rank 2 in both lists (2 × 1e6/62 = 32258); doc 1 is
    // rank 1 in one list only (1e6/61 = 16393)
    val lex = list((0L, 1L, 1L), (0L, 7L, 2L))
    val sem = list((0L, 9L, 1L), (0L, 7L, 2L))
    val r = Fusion.rrfFuse(Seq(lex, sem), 60, 10).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toList === List(
      (7L, 2L * (1000000L / 62), 2L, 1L),
      (1L, 1000000L / 61, 1L, 2L),   // ties with 9 → doc_id asc
      (9L, 1000000L / 61, 1L, 3L)))
  }

  test("RRF respects topK per query and keeps queries independent") {
    val a = list((0L until 30L).map(d => (1L, d, d + 1)): _*)
    val b = list((5L, 100L, 1L))
    val r = Fusion.rrfFuse(Seq(a, b), 60, 10).collect()
    assert(r.count(_.getLong(0) == 1L) === 10)
    assert(r.count(_.getLong(0) == 5L) === 1)
    // query 1's top-10 are its first 10 ranks in order
    val q1 = r.filter(_.getLong(0) == 1L).sortBy(_.getLong(4)).map(_.getLong(1))
    assert(q1.toList === (0L until 10L).toList)
  }
}
