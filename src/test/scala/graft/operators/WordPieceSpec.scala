package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.WordPieceMatch

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "aab"×3, "ab"×2. Hand replay of the likelihood scoring:
  //   r1: c(a)=8, c(b)=5; n(a,a)=3 -> 3e12/64 = 46_875_000_000,
  //       n(a,b)=5 -> 5e12/40 = 125_000_000_000  -> merge "ab"
  //       ("ab" wins although (a,a) and (a,b) would TIE at 5 vs 3 under
  //        raw-count BPE scoring only if counts matched — here the
  //        likelihood denominator is what decides)
  //   r2: syms now aab=[a,ab]×3, ab=[ab]×2; c(a)=3, c(ab)=5;
  //       n(a,ab)=3 -> 3e12/15 = 200_000_000_000 -> merge "aab"
  //   r3: no adjacent pairs remain -> exhausted
  private def trainDf = Seq((1L, "aab aab aab"), (2L, "ab ab"))
    .toDF("doc_id", "text")

  test("wordpieceTrain picks the likelihood-scored merge each round") {
    val got = TextAnalysis.wordpieceTrain(trainDf, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got === Seq(
      (1, "a", "b", "ab", 125000000000L, 5L),
      (2, "a", "ab", "aab", 200000000000L, 3L)))
    CheckpointScope.releaseAll()
  }

  test("wordpieceTrain diverges from raw-count BPE when parts are rare") {
    // "xy"×1 among "aa"×9: BPE would merge (a,a) (count 9 vs 1);
    // wordpiece merges (x,y): 1e12/(1*1) = 1e12 beats 9e12/(18*18)
    val df = Seq((1L, ("aa " * 9).trim + " xy")).toDF("doc_id", "text")
    val first = TextAnalysis.wordpieceTrain(df, rounds = 1).collect()(0)
    assert((first.getString(1), first.getString(2)) === ("x", "y"))
    CheckpointScope.releaseAll()
  }

  test("wordpieceEncode greedy-matches longest-first with whole-word UNK") {
    val vocab = TextAnalysis.wordpieceVocab(trainDf, rounds = 3)
    assert(vocab.toSet === Set("a", "b", "ab", "aab"))
    // "aab"->1 piece, "ab"->1, "ba"->b+a=2, "ab9"->UNK (digit char
    // excluded from the alphabet; whole word collapses to ONE piece)
    val enc = Seq((7L, "aab ab ba ab9")).toDF("doc_id", "text")
    val r = TextAnalysis.wordpieceEncode(enc, vocab).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === (7L, 4L, 5L, 1L))
    CheckpointScope.releaseAll()
  }

  test("greedy walk is code-point indexed and prefers the longest match") {
    val m = new WordPieceMatch.Model(Seq("a", "b", "ab", "aab", "😀"), 3)
    def walk(w: String) = {
      val p = WordPieceMatch.walk(w, m); (p >> 1, (p & 1) == 1)
    }
    assert(walk("aabab") === (2, false))     // aab + ab, not a+ab+ab
    assert(walk("") === (0, false))
    assert(walk("😀a") === (2, false)) // astral char = 1 position
    assert(walk("az") === (1, true))         // z unmatched -> whole-word UNK
  }

  test("digit-bearing alphabet chars are excluded from the encode vocab") {
    val df = Seq((1L, "a7b a7b ab")).toDF("doc_id", "text")
    val vocab = TextAnalysis.wordpieceVocab(df, rounds = 1)
    assert(!vocab.exists(_.contains("7")))
  }
}
