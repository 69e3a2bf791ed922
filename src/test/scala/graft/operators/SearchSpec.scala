package graft.operators

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def qs(rows: (Long, String)*) = rows.toDF("query_id", "phrase")

  test("phraseOccurrences: contiguous token runs only, with positions") {
    val d = docs(
      (1L, "the quick brown fox jumps"),
      (2L, "quick brown dog and the quick brown fox"),
      (3L, "brown quick fox"),          // right tokens, wrong order
      (4L, "the quick  brown fox"))     // multi-space still tokenizes
    val r = Search.phraseOccurrences(qs((10L, "quick brown fox")), d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._2)
    assert(r.toSeq === Seq(
      (10L, 1L, 1L, 1L),   // one occurrence at token offset 1
      (10L, 2L, 1L, 5L),
      (10L, 4L, 1L, 1L)))
  }

  test("phraseOccurrences: repeated-term phrases and overlapping matches count correctly") {
    val d = docs((1L, "ha ha ha ha"), (2L, "ha xa ha"))
    val r = Search.phraseOccurrences(qs((1L, "ha ha")), d)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3))).sortBy(_._1)
    // doc 1: anchors 0,1,2 (overlaps allowed); doc 2: none contiguous
    assert(r.toSeq === Seq((1L, 3L, 0L)))
  }

  test("phraseOccurrences: case and surrounding whitespace normalize away") {
    val d = docs((1L, "  Alpha BETA gamma "))
    val r = Search.phraseOccurrences(qs((1L, "alpha beta")), d).collect()
    assert(r.length === 1 && r(0).getLong(3) === 0L)
  }

  test("phraseOccurrences: multiple queries resolve independently") {
    val d = docs((1L, "a b c d"), (2L, "c d e"))
    val r = Search.phraseOccurrences(qs((1L, "a b"), (2L, "c d")), d)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r === Set((1L, 1L), (2L, 1L), (2L, 2L)))
  }
}
