package graft.operators

import graft.SparkSpec

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs: counts and integer ratio match a hand computation") {
    // 4 docs; "a" in all, "b" in 3, "c" in 2 (always with b), "rare"
    // in 1 — rare falls outside topN=3
    val d = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b rare"), (4L, "a a"))
      .toDF("doc_id", "text")
    val r = Cooccur.pmiPairs(d, topN = 3, minPairCount = 1L).collect()
      .map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // n_docs=4; a:4, b:3, c:2
    assert(r === Map(
      ("a", "b") -> ((3L, 4L, 3L, 10000L)),  // 3*4*1e4/(4*3)
      ("a", "c") -> ((2L, 4L, 2L, 10000L)),
      ("b", "c") -> ((2L, 3L, 2L, 13333L)))) // 2*4*1e4/(3*2)
  }

  test("pmiPairs: minPairCount prunes and duplicate tokens in a doc count once") {
    val d = Seq((1L, "x x y"), (2L, "x y"), (3L, "x z"))
      .toDF("doc_id", "text")
    val r = Cooccur.pmiPairs(d, topN = 10, minPairCount = 2L).collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    assert(r === Map(("x", "y") -> 2L)) // (x,z) has n_ab=1, pruned
  }

  test("pmiPairs: positively-associated pairs outscore independent ones") {
    // p and q always together; u and v never
    val d = (0 until 40).map { i =>
      val extra = if (i % 2 == 0) "p q u" else "filler v"
      (i.toLong, s"base$i $extra")
    }.toDF("doc_id", "text")
    val r = Cooccur.pmiPairs(d, topN = 6, minPairCount = 1L).collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(5))).toMap
    assert(r(("p", "q")) === 20000L)      // perfectly associated: 2x
    assert(!r.contains(("u", "v")))       // never co-occur: no row
  }
}
