package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the deterministic unigram-LM tokenizer:
  * the integer-Viterbi objective (fewest pieces, ties to the largest
  * count sum, reconstruction ties to the longest piece), the UNK
  * single-character fallback, and the train loop's seed → E-step →
  * prune round structure. */
class UnigramSpec extends SparkSpec {

  import org.apache.spark.sql.graftbridge.Bridge

  private def pieceCount(w: String, vocab: Seq[(String, Long)], k: Int = 4): Int = {
    import spark.implicits._
    Seq(w).toDF("w")
      .select(Bridge.column(graft.functions.UnigramPieceCount(
        Bridge.expression(col("w")), vocab, k)).as("n"))
      .head().getInt(0)
  }

  private def pieces(w: String, vocab: Seq[(String, Long)], k: Int = 4): Seq[String] = {
    import spark.implicits._
    Seq(w).toDF("w")
      .select(Bridge.column(graft.functions.UnigramViterbiPieces(
        Bridge.expression(col("w")), vocab, k)).as("ps"))
      .head().getSeq[String](0)
  }

  private val vocab = Seq(
    "a" -> 5L, "b" -> 5L, "c" -> 3L, "ab" -> 7L, "ba" -> 2L, "abc" -> 1L)

  test("Viterbi: fewest pieces wins, then largest count sum") {
    // abab: [ab, ab] (2 pieces, sum 14) beats [a, ba, b] (3) and
    // [a, b, a, b] (4)
    assert(pieces("abab", vocab) === Seq("ab", "ab"))
    assert(pieceCount("abab", vocab) === 2)
    // abc: the single piece [abc] (sum 1) beats [ab, c] (2 pieces,
    // sum 10) — the count sum only breaks PIECE-COUNT ties
    assert(pieces("abc", vocab) === Seq("abc"))
    assert(pieceCount("abc", vocab) === 1)
    // cc: only chars cover it
    assert(pieces("cc", vocab) === Seq("c", "c"))
  }

  test("Viterbi: count-sum tie-break and longest-piece reconstruction tie") {
    // vocab where two 2-piece segmentations compete: xy|z (5+9=14)
    // vs x|yz (5+8=13) — the larger sum wins
    val v = Seq("x" -> 5L, "y" -> 1L, "z" -> 9L, "xy" -> 5L, "yz" -> 8L)
    assert(pieces("xyz", v) === Seq("xy", "z"))
    // equal-(np, sc) candidates at one position: both orderings sum the
    // same — reconstruction must take the LONGEST first piece
    val v2 = Seq("p" -> 3L, "q" -> 3L, "pq" -> 6L, "r" -> 1L)
    // pq|r (2 pieces, 7) vs p|q|r (3) — and with c(pq)=c(p)+c(q) the
    // one-piece-shorter path still wins on count; force the tie with
    // two exact 2-piece splits: "pqpq" → pq|pq (2, 12) unique best
    assert(pieces("pqpq", v2) === Seq("pq", "pq"))
  }

  test("UNK fallback: unseen single characters segment with count 0") {
    // '?' is not in the vocabulary: it must still segment (one piece,
    // count 0), and surrounding vocab pieces still merge
    assert(pieces("ab?ab", vocab) === Seq("ab", "?", "ab"))
    assert(pieceCount("?", vocab) === 1)
    assert(pieceCount("", vocab) === 0)
  }

  test("unigramTrain: seed, E-step usage, prune — tiny corpus walkthrough") {
    import spark.implicits._
    // corpus: "abab abab abc" — wf: abab×2, abc×1
    val docs = Seq((1L, "abab abab"), (2L, "abc")).toDF("doc_id", "text")
    // alphabet totals: a: 2·2+1=5, b: 5, c: 1
    // substring seeds (len 2..4) weighted: ab: 2·2+1=5, ba: 2, bab: 2,
    // aba: 2, abab: 2, abc: 1, bc: 1 → top-3 by (cnt desc, piece asc):
    // ab(5), aba(2), abab(2)
    val v0 = TextAnalysis.unigramTrain(docs, seedN = 3, maxPieceLen = 4,
      keepSizes = Seq.empty).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v0.toMap === Map("a" -> 5L, "b" -> 5L, "c" -> 1L,
      "ab" -> 5L, "aba" -> 2L, "abab" -> 2L))
    // one E/M round keeping 2 multis: Viterbi segments abab → [abab]
    // (1 piece beats ab|ab), abc → [ab, c] (abc not in vocab; 2 pieces:
    // ab+c sum 6 vs aba?+... aba|? invalid — a|b|c is 3) →
    // usage: abab: 2, ab: 1, c: 1 → keep top-2 multis: abab(2), ab(1);
    // chars keep max(usage, 1): a:1 (unused), b:1, c:1
    val v1 = TextAnalysis.unigramTrain(docs, seedN = 3, maxPieceLen = 4,
      keepSizes = Seq(2)).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v1.toMap === Map("a" -> 1L, "b" -> 1L, "c" -> 1L,
      "ab" -> 1L, "abab" -> 2L))
  }

  test("unigramEncode: per-doc optimal piece counts under the trained vocab") {
    import spark.implicits._
    val docs = Seq((1L, "abab abab"), (2L, "abc")).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramVocabulary(docs, seedN = 3, maxPieceLen = 4,
      keepSizes = Seq(2))
    val got = TextAnalysis.unigramEncode(docs, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: 2 words "abab" → 1 piece each; doc 2: "abc" → ab|c = 2
    assert(got === Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L))))
  }
}
