package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private lazy val documents =
    spark.read.parquet(sf("sf0.01") + "/documents.parquet").cache()

  test("LSH candidates achieve full recall of true near-dup pairs (banding property)") {
    val truePairs = Dedup.jaccardPairs(documents, 1, 2).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = Dedup.lshCandidates(Dedup.minhashSignatures(documents))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty)
    val recall = truePairs.intersect(candidates).size.toDouble / truePairs.size
    assert(recall >= 0.95, s"LSH recall $recall; missed ${truePairs -- candidates}")
    // candidate set stays near the true pair count — no all-pairs blowup
    assert(candidates.size < truePairs.size * 20 + 50)
  }

  test("near-dup pairs have higher simhash agreement than random pairs") {
    val sh = Dedup.simhash(documents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = Dedup.jaccardPairs(documents, 1, 2).select("id_a", "id_b")
      .collect().map(r => hamming(sh(r.getLong(0)), sh(r.getLong(1))))
    val rnd = new scala.util.Random(42)
    val ids = sh.keys.toArray
    val random = (1 to 200).map { _ =>
      hamming(sh(ids(rnd.nextInt(ids.length))), sh(ids(rnd.nextInt(ids.length))))
    }
    assert(near.nonEmpty)
    assert(near.sum.toDouble / near.length < random.sum.toDouble / random.length,
      s"near avg ${near.sum.toDouble / near.length} vs random ${random.sum.toDouble / random.length}")
  }

  test("exact dedup groups duplicated texts and keeps the minimum id") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (5L, "alpha beta gamma"),
      (3L, "unique doc here"), (2L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val groups = Dedup.exact(df).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups === Set((1L, 3L), (3L, 1L)))
  }

  test("shingle df cap bounds join work under an adversarial hot shingle") {
    import spark.implicits._
    // 40 docs share ONE boilerplate shingle; everything else is unique.
    // Uncapped, that stop-shingle alone manufactures all C(40,2) pairs —
    // the O(m²) door the cap closes.
    val docs = (0 until 40)
      .map(i => (i.toLong, s"common boiler plate unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(docs, 1, 10, maxDf = 1000).count() === 40L * 39 / 2)
    // capped below the hot shingle's df: it leaves the join, and with it
    // every boilerplate-only pair (similarity is under-, never over-estimated)
    assert(Dedup.jaccardPairs(docs, 1, 10, maxDf = 10).count() === 0)
  }

  test("jaccard threshold arithmetic is exact at the boundary") {
    import spark.implicits._
    // docs with 4-shingle sets overlapping in exactly 2: j = 2/(4+4-2) = 1/3
    val a = "w1 w2 w3 w4 w5 w6" // shingles: 4
    val b = "w3 w4 w5 w6 x1 x2" // shares shingles "w3 w4 w5","w4 w5 w6" => inter=2
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(df, 1, 3).count() === 1) // 1/3 >= 1/3 inclusive
    assert(Dedup.jaccardPairs(df, 1, 2).count() === 0) // 1/3 <  1/2
  }

  test("langId classifies held-out sentences in all six profile languages") {
    import spark.implicits._
    // none of these sentences appear in the profile samples — the
    // n-gram profiles must generalize, incl. the Cyrillic (non-Latin)
    // path end to end
    val df = Seq(
      (1L, "The house was on the hill and there was a light in it for all of them"),
      (2L, "Der Hund und die Katze sind nicht in dem Haus aber wir haben sie gesehen"),
      (3L, "El perro es grande y los gatos son pequenos pero no estan en la casa"),
      (4L, "Le chat est noir et les chiens sont dans la maison avec nous"),
      (5L, "Il gatto e il cane sono nella casa ma non sono molto grandi"),
      (6L, "Он был в доме и она не была с ними но мы не знали что это было"),
      (7L, "我们在这里看到了他和你说的那个人都是一样的"),
      (8L, "qqq zzz xxx qzx zxq xqz") // outside every profile -> rejected
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr",
      5L -> "it", 6L -> "ru", 7L -> "zh", 8L -> "unknown"))
  }

  test("langId plan is shuffle-free: per-row ranking, no keyed exchange") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat"), (2L, "der hund lief")).toDF("doc_id", "text")
    val plan = TextAnalysis.langId(df).queryExecution.executedPlan.toString
    // spread()'s round-robin repartition may appear depending on the
    // configured parallelism; a hash/range exchange never may
    val keyed = plan.linesIterator.filter(l => l.contains("Exchange") &&
      (l.contains("hashpartitioning") || l.contains("rangepartitioning"))).toSeq
    assert(keyed.isEmpty, s"keyed shuffle in:\n$plan")
  }

  test("langId profiles: 40 ranked grams per language, deterministic") {
    val profs = TextAnalysis.langProfiles.toMap
    assert(profs.keySet === Set("de", "en", "es", "fr", "it", "ru", "zh"))
    profs.values.foreach { p =>
      assert(p.length === TextAnalysis.LangProfileSize)
      assert(p.map(_._2) === (1 to TextAnalysis.LangProfileSize))
      // grams embed as plan/SQL literals: letters and spaces only
      p.foreach { case (g, _) =>
        assert(g.forall(c => c == ' ' || Character.isLetter(c)), s"gram '$g'")
      }
    }
    // recomputation is stable (rank literals shared with the oracle)
    assert(TextAnalysis.langProfiles === TextAnalysis.langProfiles)
  }

  test("fingerprint is whitespace-insensitive but content-sensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello   world"), (2L, "Hello world"), (3L, "hello worlds")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("tokenPieces counts GPT-2-style pre-tokenizer pieces exactly") {
    import spark.implicits._
    val df = Seq((1L, "ab ab 12, cd!"), (2L, "xx xx xx")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenPieces(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: "ab", " ab", " 12", ",", " cd", "!" — all distinct
    assert(got(1L) == ((6L, 6L)))
    // doc 2: "xx", " xx", " xx" — the space-prefixed repeat collapses
    assert(got(2L) == ((3L, 2L)))
  }

  test("winnowFingerprints: exact window minima; shared passages guarantee shared fingerprints") {
    import spark.implicits._
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"wn:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    // 9 tokens → 5 grams (k=5) → 2 windows (w=4): fps = the two minima
    val toks = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i")
    val grams = toks.sliding(5).map(_.mkString(" ")).toSeq
    val hs = grams.map(h60)
    val expected = Set(hs.slice(0, 4).min, hs.slice(1, 5).min)
    val got = TextAnalysis.winnowFingerprints(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"), 5, 4)
      .collect().map(_.getLong(1)).toSet
    assert(got == expected)
    // overlap guarantee: any >= k+w-1-token shared passage shares a window
    val passage = "the quick brown fox jumps over seven lazy sleeping dogs"
    val two = Seq(
      (10L, "unrelated prefix words here " + passage),
      (20L, passage + " and a completely different ending")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(two, 5, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val a = fps.filter(_._1 == 10L).map(_._2).toSet
    val b = fps.filter(_._1 == 20L).map(_._2).toSet
    assert(a.intersect(b).nonEmpty)
  }

  test("winnowPairs finds partial-overlap pairs that whole-doc Jaccard misses") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over seven lazy sleeping dogs " +
      "while autumn rain keeps falling on the quiet empty station platform"
    val fillerA = Seq.tabulate(80)(i => s"alpha$i").mkString(" ")
    val fillerB = Seq.tabulate(80)(i => s"beta$i").mkString(" ")
    val df = Seq(
      (1L, fillerA + " " + passage),   // long doc quoting the passage
      (2L, passage + " " + fillerB),   // different long doc, same quote
      (3L, Seq.tabulate(90)(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(df, 5, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // the same pair is INVISIBLE to whole-document Jaccard at 1/2: the
    // shared passage is ~20% of either doc — winnowing's use case
    assert(Dedup.jaccardPairs(df, 1, 2).count() == 0)
  }

  test("nightly equals keepers-intersect-incremental on a mixed fixture") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val prior = Seq(
      (1L, base),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val ending = " with completely fresh trailing content words"
    val newBatch = Seq(
      (10L, base),                         // exact copy of prior → dropped
      (11L, base + " uniform"),            // near-dup of prior → dropped
      (12L, "brand new document about mountains rivers" + ending),
      (13L, "brand new document about mountains rivers" + ending + " x"), // intra near-dup of 12 → cluster loser
      (14L, "entirely separate subject matter goes right here today")
    ).toDF("doc_id", "text")
    val fused = Dedup.nightly(newBatch, prior).collect().map(_.getLong(0)).toSet
    val composed = Dedup.keepers(newBatch)
      .join(Dedup.incrementalKeepers(newBatch, prior), Seq("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(fused == composed)
    assert(fused == Set(12L, 14L))
  }

  test("tfidfTopK ranks rare-and-frequent terms first with exact integer scores") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfTopK(df, 2).collect()
      .map(r => (r.getLong(0), r.getLong(5)) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: apple tf=2 df=1 → 2e6; banana tf=1 df=2 → 5e5
    assert(rows((1L, 1L)) == (("apple", 2L, 1L, 2000000L)))
    assert(rows((1L, 2L)) == (("banana", 1L, 2L, 500000L)))
    // doc 3: cherry tf=3 df=2 → 1.5e6 beats durian tf=1 df=1 → 1e6
    assert(rows((3L, 1L)) == (("cherry", 3L, 2L, 1500000L)))
    assert(rows((3L, 2L)) == (("durian", 1L, 1L, 1000000L)))
  }

  test("bm25TopK: ubiquitous terms score exactly zero, tf saturates, " +
    "longer documents are penalized") {
    import spark.implicits._
    val df = Seq(
      (1L, "common rare rare single"),
      (2L, "common rare3 rare3 f f f f f"),
      (3L, "common x1 x2"),
      (4L, "common y1 y2")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.bm25TopK(df, 3).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    // 'common' appears in every doc → idf2 = floor(log2(4//4)) = 0:
    // ubiquitous terms drop out entirely (raw tf/df never does this)
    assert(rows((1L, "common")) === 0L)
    assert(rows((3L, "common")) === 0L)
    // saturation: same doc, same idf — tf=2 scores more than tf=1 but
    // LESS than twice it (diminishing returns; tf/df would be linear)
    val rare = rows((1L, "rare"))     // tf=2, df=1, dl=4
    val single = rows((1L, "single")) // tf=1, df=1, dl=4
    assert(rare > single && rare < 2 * single, s"rare=$rare single=$single")
    // length normalization: same (tf, df) scores HIGHER in the shorter
    // document — dl=4 vs dl=8
    assert(rare > rows((2L, "rare3")), s"$rare vs ${rows((2L, "rare3"))}")
  }

  test("bm25DocTopK: sums per-term scores, drops stopword-only matches, ties on doc_id") {
    import spark.implicits._
    val docsDf = Seq(
      (1L, "common apple banana"),
      (2L, "common apple"),
      (3L, "common banana banana"),
      (4L, "common only")
    ).toDF("doc_id", "text")
    val qs = Seq((10L, "apple banana common"), (20L, "common")).toDF("query_id", "qtext")
    val out = TextAnalysis.bm25DocTopK(qs, docsDf, 10).collect()
      .map(r => (r.getLong(0), r.getLong(4)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // query 20 matches ONLY the ubiquitous term (idf2 = 0): no rows at
    // all — a stopword query returns empty, never a zero-score ranking
    assert(!out.keys.exists(_._1 == 20L))
    // query 10: 'common' drops; docs 1 (apple+banana, 2 terms) beats
    // docs 2 and 3 (1 term each)
    val ranked = out.toSeq.filter(_._1._1 == 10L).sortBy(_._1._2)
    assert(ranked.head._2._1 === 1L)   // doc 1 first (two terms summed)
    assert(ranked.head._2._2 === 2L)   // n_terms = 2
    assert(ranked.map(_._2._1).toSet === Set(1L, 2L, 3L)) // doc 4 absent
    // per-query ranks are dense from 1
    assert(ranked.map(x => x._1._2) === Seq(1L, 2L, 3L))
    // replaying the one-doc-per-term scores: doc2/doc3 each carry one
    // rarer term; both present, ordered by score then doc_id
    val s2 = ranked.find(_._2._1 == 2L).get._2._3
    val s3 = ranked.find(_._2._1 == 3L).get._2._3
    assert(s2 > 0 && s3 > 0)
  }

  test("bm25DocTopK non-broadcast query path is value-identical") {
    import spark.implicits._
    val docsDf = (1L to 40L).map(i =>
      (i, s"common w${i % 7} w${i % 11} " + ("pad " * (i % 5).toInt).trim))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "w1 w3 common"), (2L, "w2 w10")).toDF("query_id", "qtext")
    def rows(bcast: Boolean) =
      TextAnalysis.bm25DocTopK(qs, docsDf, 10, broadcastQueries = bcast)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    assert(rows(true) === rows(false))
    assert(rows(true).nonEmpty)
  }

  test("spanDedup removes an offset-shifted shared passage (what segment alignment misses)") {
    import spark.implicits._
    // docs 1 and 5 share a 6-token passage at DIFFERENT offsets (0 vs 1)
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 tail1"),
      (5L, "head5 alpha beta gamma delta epsilon zeta unique5"),
      (3L, "completely different words here now ok")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, 5, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 is the keeper (min id): untouched
    assert(out(1L) == ((8L, 8L, "alpha beta gamma delta epsilon zeta unique1 tail1")))
    // doc 5: dup 5-grams start at 1 and 2 → positions 1..6 covered; the
    // two maximal-span survivors are the head and tail tokens
    assert(out(5L) == ((8L, 2L, "head5 unique5")))
    // doc 3 shares nothing and is untouched
    assert(out(3L) == ((6L, 6L, "completely different words here now ok")))
  }

  test("bpeMergeCandidates counts word-frequency-weighted adjacent char pairs") {
    import spark.implicits._
    // words: aa x3, abc x2, bb x1 -> pairs: aa=3, ab=2, bc=2, bb=1
    val df = Seq(
      (1L, "aa abc"),
      (2L, "aa aa abc bb")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergeCandidates(df, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("aa", 3L), ("ab", 2L), ("bc", 2L), ("bb", 1L)))
  }

  test("bpeTrain matches a brute-force Sennrich loop incl. merged-symbol rounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (1 to 60).map { i =>
      (i.toLong,
        (1 to (rnd.nextInt(6) + 2))
          .map(_ => (1 to (rnd.nextInt(4) + 1)).map(_ => "ab".charAt(rnd.nextInt(2))).mkString)
          .mkString(" "))
    }
    // reference: frequency-weighted vocab of symbol seqs, greedy
    // left-to-right merge each round, (count desc, lhs, rhs) tie-break
    var vocab: Map[Seq[String], Long] = docs
      .flatMap(_._2.split("\\s+")).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
      .map { case (w, c) => w.map(_.toString) -> c }
    val expect = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    for (r <- 1 to 6) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((a, b), t) = counts.toSeq.minBy { case ((l, rr), c) => (-c, l, rr) }
        expect += ((r, a, b, a + b, t))
        vocab = vocab.toSeq.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq -> c
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    val got = TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got === expect.toSeq)
    // the tiny alphabet forces later rounds to merge MERGED symbols —
    // the part bpeMergeCandidates alone cannot see
    assert(expect.exists { case (_, a, b, _, _) => a.length > 1 || b.length > 1 })
  }

  test("bpeEncode replays merges like the brute-force tokenizer, word by word") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aba bab abab"),
      (2L, "aa bb ab ba"),
      (3L, "abababab a b")
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, 4).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // reference: greedy left-to-right replay per word
    def encode(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toSeq
      }
    val expect = Seq(1L, 2L, 3L).map { id =>
      val ws = Map(1L -> "aba bab abab", 2L -> "aa bb ab ba",
        3L -> "abababab a b")(id).split(" ").toSeq
      id -> ((ws.length.toLong, ws.map(w => encode(w).length.toLong).sum))
    }.toMap
    val got = TextAnalysis.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
    // merged pieces actually shrink the count (the merges bit)
    assert(got(3L)._2 < 10L)
  }

  test("bpeEncodeBytes: byte fallback never drops, specials are one piece and " +
    "bypass merges, training excludes specials") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa <|sep|> aa"),     // 'aa' dominates pair counts
      (2L, "данные 🦊 <|sep|>"),       // mixed script + emoji + special
      (3L, "aaaa")
    ).toDF("doc_id", "text")
    val trained = TextAnalysis.bpeTrainBytes(docs, 2, Seq("<|sep|>")).collect()
      .sortBy(_.getInt(0))
    val merges = trained.map(r => (r.getString(1), r.getString(2))).toSeq
    // round 1 must merge 'a'+'a' (hex 61,61) — the dominant pair; had
    // specials leaked into the statistics, '<'|'|' pairs would compete
    assert(merges.head === (("61", "61")))
    assert(trained.forall(r => !r.getString(3).contains("3C")),
      "special token's bytes leaked into the merge statistics")
    val got = TextAnalysis.bpeEncodeBytes(docs, merges, Seq("<|sep|>")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 4 'aa' words (1 piece each after the 6161 merge) + 1 special
    assert(got(1L) === ((5L, 1L, 5L)))
    // doc 2: данные = 12 UTF-8 bytes with round 2's (D0,BD) merge
    // applying twice -> 10 pieces, fox emoji = 4 bytes untouched,
    // NOTHING drops; the special is exactly one piece
    assert(merges(1) === (("D0", "BD")))
    assert(got(2L) === ((3L, 1L, 10L + 4L + 1L)))
    // doc 3: 'aaaa' = 4 bytes -> 2 merged pieces (round 2 may merge
    // further; allow either but never the unmerged 4)
    assert(got(3L)._3 < 4L)
  }

  test("PolyGrams rolling recurrence equals the per-position fold, codegen and interpreted") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val rnd = new scala.util.Random(17)
    // random 60-bit-ish hash arrays incl. the n < k and n == k edges
    val rows = (Seq(0, 1, 4, 5) ++ Seq.fill(30)(rnd.nextInt(60) + 2)).zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)(rnd.nextLong().abs & ((1L << 60) - 1))) }
    for (k <- Seq(1, 3, 5, 20)) {
      val df = rows.toDF("id", "hs")
      val fused = df.select(col("id"), Bridge.column(
          graft.functions.PolyGrams(Bridge.expression(col("hs")), k)).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // the oracle spelling: per-position fold over the same array
      val fold = df.select(col("id"), expr(
          s"""if(size(hs) >= $k, transform(sequence(0, size(hs)-$k),
                i -> ${Dedup.spanGramHash(k)}), cast(array() as array<bigint>))""").as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused == fold, s"k=$k")
      // interpreted eval (no codegen) must agree too
      for ((id, hs) <- rows) {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray)
        val got = graft.functions.PolyGrams(
            org.apache.spark.sql.catalyst.expressions.Literal(arr,
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)), k)
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        assert(got.toLongArray().toSeq == fused(id.toLong), s"k=$k id=$id interpreted")
      }
    }
  }

  test("WindowMinima equals the ladder+array_distinct spelling, codegen and interpreted") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val rnd = new scala.util.Random(23)
    // small value range forces duplicate minima (the dedup path); edge
    // sizes cover n < w, n == w, and repeated-value plateaus
    val rows = (Seq(0, 1, 3, 4, 5) ++ Seq.fill(30)(rnd.nextInt(80) + 2)).zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)(rnd.nextInt(12).toLong)) }
    for (w <- Seq(1, 2, 4, 7)) {
      val df = rows.toDF("id", "ghs")
      val fused = df.select(col("id"), Bridge.column(
          graft.functions.WindowMinima(Bridge.expression(col("ghs")), w)).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val ladder =
        if (w == 1) "ghs[j]"
        else (0 until w).map(j => s"ghs[j+$j]").mkString("least(", ", ", ")")
      val oracle = df.select(col("id"), expr(
          s"""if(size(ghs) >= $w,
                array_distinct(transform(sequence(0, size(ghs)-$w), j -> $ladder)),
                cast(array() as array<bigint>))""").as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // ordering included: both keep first occurrence
      assert(fused == oracle, s"w=$w")
      for ((id, ghs) <- rows) {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(ghs.toArray)
        val got = graft.functions.WindowMinima(
            org.apache.spark.sql.catalyst.expressions.Literal(arr,
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)), w)
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        assert(got.toLongArray().toSeq == fused(id.toLong), s"w=$w id=$id interpreted")
      }
    }
  }

  test("spanDedup matches a brute-force reference on random high-duplication corpora") {
    import spark.implicits._
    val k = 3
    val rnd = new scala.util.Random(9)
    // tiny vocabulary -> dense accidental k-gram sharing across docs
    val docs = (1 to 40).map { i =>
      (i.toLong, (1 to (rnd.nextInt(15) + k)).map(_ => s"t${rnd.nextInt(5)}").mkString(" "))
    }
    // reference: dup grams on the token SEQUENCES themselves (no
    // hashing — also cross-checks that the polynomial gram hash is
    // faithful), keeper = min doc, coverage by any dup start within k
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val grams = toks.view.mapValues(ws => ws.sliding(k).toSeq.filter(_.length == k)).toMap
    val keeper = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (g, occ) if occ.map(_._2).distinct.size >= 2 =>
        g -> occ.map(_._2).min }
    def refKept(id: Long): Seq[String] = {
      val ws = toks(id)
      val starts = grams(id).zipWithIndex.collect {
        case (g, i) if keeper.get(g).exists(_ != id) => i
      }.toSet
      ws.indices.filterNot(p => starts.exists(s => s <= p && p <= s + k - 1)).map(ws)
    }
    val out = Dedup.spanDedup(docs.toDF("doc_id", "text"), k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    for ((id, _) <- docs) {
      val kept = refKept(id)
      assert(out(id) == ((toks(id).length.toLong, kept.length.toLong, kept.mkString(" "))),
        s"doc $id")
    }
  }

  test("spanDedupChars matches a brute-force reference on random corpora with copies") {
    import spark.implicits._
    val k = 6
    val rnd = new scala.util.Random(31)
    // tiny alphabet + punctuation noise -> dense char-gram sharing; the
    // cleaned stream strips the noise so copies align
    val base = (1 to 25).map { i =>
      (i.toLong, (1 to (rnd.nextInt(20) + k))
        .map(_ => "ab,. !".charAt(rnd.nextInt(6)).toString).mkString)
    }
    val docs = base ++ base.take(10).zipWithIndex.map { case ((_, t), j) => (50L + j, t) }
    def cleanOf(t: String): String =
      t.trim.toLowerCase.replaceAll("[^a-z0-9]", "")
    val cleans = docs.map { case (id, t) => id -> cleanOf(t) }
      .filter(_._2.nonEmpty).toMap
    val grams = cleans.view.mapValues(c =>
      if (c.length < k) Seq.empty else c.sliding(k).toSeq).toMap
    val keeper = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (g, occ) if occ.map(_._2).distinct.size >= 2 =>
        g -> occ.map(_._2).min }
    def refDup(id: Long): Long = {
      val c = cleans(id)
      val starts = grams(id).zipWithIndex.collect {
        case (g, i) if keeper.get(g).exists(_ != id) => i
      }.toSet
      c.indices.count(p => starts.exists(s => s <= p && p <= s + k - 1)).toLong
    }
    val out = Dedup.spanDedupChars(docs.toDF("doc_id", "text"), k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet === cleans.keySet)
    cleans.keys.foreach { id =>
      assert(out(id) === ((cleans(id).length.toLong, refDup(id))), s"doc $id")
    }
    // copies produce full coverage for non-keeper members somewhere
    assert(out.exists { case (_, (n, d)) => n > 0 && n == d })
  }

  test("spanDedup with exact text copies: collapse fans per-doc keeper status back out") {
    import spark.implicits._
    val k = 3
    val rnd = new scala.util.Random(11)
    val base = (1 to 20).map { i =>
      (i.toLong, (1 to (rnd.nextInt(12) + k)).map(_ => s"t${rnd.nextInt(4)}").mkString(" "))
    }
    // exact copies under higher ids: each copied text now has members on
    // both sides of the keeper split, the collapse's interesting case
    val docs = base ++ base.take(12).zipWithIndex.map { case ((_, t), j) =>
      (100L + j, t)
    } ++ base.take(4).zipWithIndex.map { case ((_, t), j) => (200L + j, t) }
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val grams = toks.view.mapValues(ws => ws.sliding(k).toSeq.filter(_.length == k)).toMap
    val keeper = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (g, occ) if occ.map(_._2).distinct.size >= 2 =>
        g -> occ.map(_._2).min }
    def refKept(id: Long): Seq[String] = {
      val ws = toks(id)
      val starts = grams(id).zipWithIndex.collect {
        case (g, i) if keeper.get(g).exists(_ != id) => i
      }.toSet
      ws.indices.filterNot(p => starts.exists(s => s <= p && p <= s + k - 1)).map(ws)
    }
    val out = Dedup.spanDedup(docs.toDF("doc_id", "text"), k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.size === docs.size)
    for ((id, _) <- docs) {
      val kept = refKept(id)
      assert(out(id) == ((toks(id).length.toLong, kept.length.toLong, kept.mkString(" "))),
        s"doc $id")
    }
    // sanity: at least one copied doc keeps fewer tokens than its
    // group's keeper (the two CASE variants genuinely differ)
    val differs = base.take(12).indices.exists { j =>
      out(100L + j)._2 < out(base(j)._1)._2
    }
    assert(differs)
  }

  test("spanDedupApprox: exact for long spans, bounded misses only ever keep more") {
    import spark.implicits._
    val k = 5; val w = 4 // winnow guarantee: spans >= k+w-1 = 8 tokens
    val long = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val short = "one two three four five" // exactly k tokens
    val df = Seq(
      (1L, s"$long keeper1 tail"),
      (2L, s"head2 $long tail2"),          // long span at another offset
      (3L, s"$short only in this and"),
      (4L, s"prefix4 $short suffix4 pad"), // short span: may be missed
      (5L, "completely unrelated filler words go here now"),
      (6L, "another disjoint document with its own tokens")
    ).toDF("doc_id", "text")
    val exact = Dedup.spanDedup(df, k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val approx = Dedup.spanDedupApprox(df, k, 2, w, maxCandidateFrac = 1.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(approx.keySet === exact.keySet)
    // the >= 8-token shared span is caught exactly: doc 1 keeps (keeper),
    // doc 2 loses the span
    assert(approx(1L) === exact(1L))
    assert(approx(2L) === exact(2L))
    assert(approx(2L)._2 < approx(2L)._1)
    // contract on every doc: approx only ever keeps MORE than exact
    // (a miss skips a removal; it never invents one), and untouched
    // docs pass through intact
    for (id <- exact.keys) {
      assert(approx(id)._1 === exact(id)._1, s"n_tokens doc $id")
      assert(approx(id)._2 >= exact(id)._2, s"n_kept doc $id")
    }
    assert(approx(5L)._2 === approx(5L)._1)
    assert(approx(6L)._2 === approx(6L)._1)
  }

  test("spanDedupApprox equals spanDedup on a high-duplication random corpus " +
    "when every dup span is winnow-long") {
    import spark.implicits._
    val k = 3; val w = 2 // guarantee span length k+w-1 = 4
    val rnd = new scala.util.Random(23)
    // build docs by concatenating a few SHARED 6-token blocks (longer
    // than k+w-1, so every cross-doc duplication is winnow-visible)
    // with per-doc unique filler between them
    val blocks = (0 until 5).map(b => (0 until 6).map(t => s"b${b}x$t").mkString(" "))
    val docs = (1 to 30).map { i =>
      val parts = (0 until (rnd.nextInt(3) + 1)).flatMap { _ =>
        Seq(blocks(rnd.nextInt(blocks.length)), s"u${i}q${rnd.nextInt(1000)}")
      }
      (i.toLong, parts.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val exact = Dedup.spanDedup(df, k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val approx = Dedup.spanDedupApprox(df, k, 2, w, maxCandidateFrac = 1.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(approx === exact)
  }

  test("spanDedupCharsApprox: coverage only drops, exact on winnow-long char spans, " +
    "bail-out restores short spans") {
    import spark.implicits._
    val k = 10; val w = 3 // winnow-long threshold: k+w-1 = 12 cleaned chars
    val long = "abcdefghijklmnop" // 16 shared cleaned chars >= 12
    val s10 = "0123456789" // exactly k — a structural miss candidate
    val df = Seq(
      (1L, s"$long qdocone"),
      (2L, s"zz $long ytwo"),
      (3L, s"$s10 aaaaaaa"),
      // doc 4 cleans to 11 chars < 12: no fingerprint window exists, so
      // the pure approx path can never see it — structural miss
      (4L, s"x $s10"),
      (5L, "unrelated filler words entirely")
    ).toDF("doc_id", "text")
    val exact = Dedup.spanDedupChars(df, k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val approx = Dedup.spanDedupCharsApprox(df, k, 2, w, maxCandidateFrac = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(approx.keySet === exact.keySet)
    // exact flags doc 4's k-char overlap; pure approx structurally cannot
    assert(exact(4L)._2 === 10L)
    assert(approx(4L)._2 === 0L)
    // the winnow-long span is exact: doc 2 (non-keeper) coverage matches
    assert(exact(2L)._2 >= 16L)
    assert(approx(2L) === exact(2L))
    // coverage only ever drops; n_chars never changes
    for (id <- exact.keys) {
      assert(approx(id)._1 === exact(id)._1, s"n_chars doc $id")
      assert(approx(id)._2 <= exact(id)._2, s"coverage rose for doc $id")
    }
    // bail-out: add three duplicated texts -> 4 of 8 distinct... make it
    // 5 of 8 candidates is not needed; duplicate three NEW texts so
    // candidates (3 dup texts + docs 1,2) = 5 of 8 distinct > 0.5
    val more = df.union(Seq(
      (6L, "first duplicated body"), (7L, "first duplicated body"),
      (8L, "second duplicated body"), (9L, "second duplicated body"),
      (10L, "third duplicated body"), (11L, "third duplicated body")
    ).toDF("doc_id", "text"))
    val exact2 = Dedup.spanDedupChars(more, k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bailed = Dedup.spanDedupCharsApprox(more, k, 2, w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bailed === exact2) // short span on doc 4 included
    assert(bailed(4L)._2 === 10L)
  }

  test("spanDedupApprox bail-out: majority-duplicated corpus falls back to exact " +
    "semantics, short spans included") {
    import spark.implicits._
    val k = 5; val w = 4
    val short = "one two three four five" // exactly k tokens — pure approx MISSES it
    // candidacy is measured over DISTINCT texts: three duplicated texts
    // out of five distinct -> 0.6 > the 0.5 default
    val df = Seq(
      (1L, "copied text body repeated verbatim across documents here"),
      (2L, "copied text body repeated verbatim across documents here"),
      (3L, "second duplicated body with its own distinct words inside"),
      (6L, "second duplicated body with its own distinct words inside"),
      (7L, "third duplicated body carrying further unique filler tokens"),
      (8L, "third duplicated body carrying further unique filler tokens"),
      (4L, s"$short plus some extra padding words"),
      // 7 tokens < k+w-1 = 8: doc 5 has no full winnow window, so the
      // pure approx path can NEVER see it as a candidate — the miss is
      // structural, not a lucky window minimum
      (5L, s"x1 $short x2")
    ).toDF("doc_id", "text")
    val exact = Dedup.spanDedup(df, k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // sanity: the short span IS removed by exact (doc 5 is not keeper)
    assert(exact(5L)._2 < exact(5L)._1)
    // pure approx misses it (docs 4, 5 share no full winnow window)
    val pure = Dedup.spanDedupApprox(df, k, 2, w, maxCandidateFrac = 1.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(pure(5L)._2 === pure(5L)._1)
    // default threshold: 3/5 candidates > 0.5 -> bail to exact, so even
    // the short span is removed
    val bailed = Dedup.spanDedupApprox(df, k, 2, w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(bailed === exact)
  }

  test("AsciiPolyGrams equals PolyGrams over ascii codes") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = Seq("abcdefghij0123", "zzzzzzzz", "a", "", "q0q0q0q0q0q0")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = docs.toDF("id", "s")
    val viaString = df.withColumn("g", Bridge.column(
        graft.functions.AsciiPolyGrams(Bridge.expression(col("s")), 4)))
      .select(col("id"), col("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaArray = df
      .withColumn("hs", expr(
        "transform(filter(split(s, ''), c -> c != ''), c -> cast(ascii(c) as bigint))"))
      .withColumn("g", Bridge.column(
        graft.functions.PolyGrams(Bridge.expression(col("hs")), 4)))
      .select(col("id"), col("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.foreach { case (id, _) => assert(viaString(id) === viaArray(id), s"id $id") }
  }

  test("spanDedupChars flags a punctuation-variant copy the word-gram path provably misses") {
    import spark.implicits._
    // docs 1 and 5 share the passage "alpha beta gamma delta epsilon
    // zeta" but with DIFFERENT punctuation/separators, so every word
    // 5-gram differs ("beta," != "beta") — yet the cleaned [a-z0-9]
    // streams share the same 30 characters
    val df = Seq(
      (1L, "Alpha beta, gamma delta epsilon zeta!"),
      (5L, "prefix words alpha beta gamma; delta epsilon zeta suffix"),
      (3L, "completely unrelated filler content here")
    ).toDF("doc_id", "text")
    // word-gram path: no duplicated 5-gram anywhere -> everything kept
    val words = Dedup.spanDedup(df, 5, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(words.values.forall { case (n, kept) => n == kept }, words.toString)
    // char-gram path: doc 1 (keeper) clean, doc 5 has the embedded
    // 30-char passage fully covered ("prefixwords"=11 + 30 + "suffix"=6)
    val chars = Dedup.spanDedupChars(df, 20, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(chars(1L) == ((30L, 0L)), chars.toString)
    assert(chars(5L) == ((47L, 30L)), chars.toString)
    assert(chars(3L)._2 == 0L, chars.toString)
  }

  test("lmScore: integer bigram-LM conditional probabilities, tf-weighted mean") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.lmScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // corpus: c("a b")=2, c("b a")=1, c("a c")=1; prefixes: c(a·)=3, c(b·)=1
    // prob_e6: a b → 2e6//3 = 666666; b a → 1e6; a c → 1e6//3 = 333333
    // doc 1: (2·666666 + 1·1000000) // 3 = 777777 over 3 bigrams
    assert(rows(1L) == ((3L, 777777L)))
    assert(rows(2L) == ((1L, 333333L)))
  }

  test("importanceWeights: target-distribution tokens weigh more; smoothing is exact") {
    import spark.implicits._
    val df = Seq((1L, "x x x x"), (2L, "y y")).toDF("doc_id", "text")
    val tgt = (ws: org.apache.spark.sql.Column) => size(ws) >= 4 // doc 1 is the target domain
    val w = TextAnalysis.importanceWeights(df, tgt, 1024).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(w(1L)._1 == 4L && w(2L)._1 == 2L)
    // x dominates the target distribution, y is absent from it
    assert(w(1L)._2 > w(2L)._2)
    // one-bucket degenerate case: every token shares the smoothed ratio
    // (tgt+1)·1e6 // (raw+1) = (4+1)·1e6 // (6+1) = 714285 exactly
    val u = TextAnalysis.importanceWeights(df, tgt, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(u == Map(1L -> 714285L, 2L -> 714285L))
  }

  test("keepersByScore ships the best-scoring cluster member, not the minimum id") {
    import spark.implicits._
    val clusterMap = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 100L), (2L, 900L), (3L, 500L), (7L, 10L), (8L, 10L), (9L, 1L))
      .toDF("doc_id", "score")
    val corpus = Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("doc_id")
    val kept = Dedup.keepersByScore(corpus, clusterMap, scores)
      .collect().map(_.getLong(0)).toSet
    // cluster 1: doc 2 wins on score (NOT min id 1); cluster 7: score
    // tie breaks to the lowest id; doc 9 is unclustered and survives
    assert(kept == Set(2L, 7L, 9L))
  }

  test("keepersByScore: clusters with missing or absent scores still ship a survivor") {
    import spark.implicits._
    // cluster 1 fully unscored; cluster 7 partially scored (only 8);
    // cluster 20 scored normally
    val clusterMap = Seq((1L, 1L), (2L, 1L), (7L, 7L), (8L, 7L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((8L, 5L), (20L, 1L), (21L, 9L)).toDF("doc_id", "score")
    val corpus = Seq(1L, 2L, 7L, 8L, 20L, 21L, 30L).toDF("doc_id")
    val kept = Dedup.keepersByScore(corpus, clusterMap, scores)
      .collect().map(_.getLong(0)).toSet
    // all-unscored cluster falls back to lowest id (1); a scored member
    // beats an unscored one (8 over 7); normal best-score (21); an
    // inner join here would have dropped BOTH 1 and 2 silently
    assert(kept == Set(1L, 8L, 21L, 30L))
  }

  test("gopherQuality: each rule fails on its engineered violator, clean docs pass") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"the code and that logic have run with care $fifty"),    // clean: passes
      (2L, "the and of that short"),                                  // too few words
      (3L, s"the of ${(1 to 60).map(_ => "a b").mkString(" ")}"),     // mean word length < 3
      (4L, s"the of ${(1 to 60).map(i => "### ...").mkString(" ")}"), // symbols + no alpha
      (5L, s"$fifty extra tokens only"),                              // no stopwords
      // duplicate-line violator: one 5-token segment repeated 12x —
      // every other rule clean (stopwords up front, mean wordlen ~5)
      (6L, "the and " + (1 to 12).map(_ => "alpha beta gamma delta epsilon").mkString(" ")),
      // bullet violator: every pseudo-line starts with a '-' token;
      // all segments distinct, alpha exactly 48/60 = 800 (still passes)
      (7L, (1 to 12).map(i => s"- the brown$i fox$i jump$i").mkString(" ")),
      // ellipsis violator: 5 of 12 segments end with '...' (42% > 30%)
      // but only 5 of 60 words carry it (symbol_e3 83 <= 100)
      (8L, (1 to 12).map(i =>
        s"the alpha$i beta$i gamma$i omega$i" + (if (i <= 5) "..." else "")).mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(9)).toMap
    assert(out == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0,
      6L -> 0, 7L -> 0, 8L -> 0))
    // signals themselves are exact on known docs
    val r1 = TextAnalysis.gopherQuality(docs).filter(col("doc_id") === 1).head()
    assert(r1.getLong(1) == 59L)       // n_words
    assert(r1.getLong(5) == 5L)        // the, and, that, have, with
    assert(r1.getLong(6) == 0L && r1.getLong(7) == 0L && r1.getLong(8) == 0L)
    // the engineered violators fail exactly their target line rule
    val sig = TextAnalysis.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(sig(6L)._1 > 300 && sig(6L)._2 <= 900 && sig(6L)._3 <= 300, sig(6L).toString)
    assert(sig(7L)._1 <= 300 && sig(7L)._2 > 900 && sig(7L)._3 <= 300, sig(7L).toString)
    assert(sig(8L)._1 <= 300 && sig(8L)._2 <= 900 && sig(8L)._3 > 300, sig(8L).toString)
  }

  test("segmentDedup removes cross-doc duplicated segments everywhere but the first document") {
    import spark.implicits._
    // docs 1 and 5 share the boilerplate segment "nav home about contact"
    // (4 tokens = one SegLen-4 segment); each also has unique content
    val docs = Seq(
      (1L, "nav home about contact real content of doc one"),
      (5L, "nav home about contact totally different body text"),
      (9L, "standalone document with no shared boilerplate at all")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, segLen = 4, minDf = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 is the minimum holder: keeps everything (9 tokens = 3 segments)
    assert(out(1L) == ((3L, 3L, "nav home about contact real content of doc one")))
    // doc 5 loses the boilerplate segment, keeps its own content in order
    assert(out(5L) == ((2L, 1L, "totally different body text")))
    // doc 9 untouched
    assert(out(9L) == ((2L, 2L, "standalone document with no shared boilerplate at all")))

    // the shared-segment inventory names the boilerplate and its keeper
    val shared = Dedup.segmentShared(docs, segLen = 4, minDf = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(shared.toSeq == Seq(("nav home about contact", 2L, 1L)))

    // a doc whose EVERY segment is boilerplate reassembles to empty, not null
    val allBoiler = Seq(
      (1L, "nav home about contact"), (2L, "nav home about contact")
    ).toDF("doc_id", "text")
    val cleaned = Dedup.segmentDedup(allBoiler, segLen = 4, minDf = 2).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(cleaned(1L) == "nav home about contact" && cleaned(2L) == "")
  }

  test("hammingNearPairs64 equals the brute-force banded reference on random keys; " +
    "hammingClusters64 labels like CC over the pair set") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // base keys + near-copies at Hamming 1..8 + exact duplicates
    val base = Seq.fill(60)(rnd.nextLong())
    val rows = base.zipWithIndex.flatMap { case (h, i) =>
      val id = i * 10L
      val flips = 1 + rnd.nextInt(8)
      var near = h
      (0 until flips).foreach(_ => near ^= 1L << rnd.nextInt(64))
      Seq((id, h), (id + 1, h), (id + 2, near)) // dup + near-copy
    }
    val df = rows.toDF("id", "h")
    val got = Dedup.hammingNearPairs64(df, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: every pair within the Hamming budget that ALSO shares
    // at least one 16-bit band (the banding contract: <= 3 always
    // shares one; 4..6 only when a band happens to agree)
    def bands(h: Long): Seq[Long] = (0 until 4).map(b => (h >>> (b * 16)) & 0xFFFFL)
    val expect = (for {
      a <- rows; b <- rows; if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2)
      if d <= 6 && bands(a._2).zip(bands(b._2)).exists(p => p._1 == p._2)
    } yield (a._1, b._1, d)).toSet
    assert(got === expect)
    assert(expect.exists(_._3 == 0) && expect.exists(_._3 > 0),
      "fixture must exercise both dup and near-dup pairs")
    // the star+hash-edge cluster path labels exactly like CC over pairs
    val viaPairs = Dedup.connectedComponents(
        Dedup.hammingNearPairs64(df, 6).select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaStars = Dedup.hammingClusters64(df, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStars === viaPairs)
  }

  test("scopedCheckpoint clamps inherited stats: no compounding across self-join rounds") {
    // Spark 4's localCheckpoint rewrites the child plan's estimated
    // Statistics into the LogicalRDD; a self-join plan MULTIPLIES its
    // children's sizes, so without the clamp the estimate squares every
    // round and by ~round 17 the driver melts down in BigInteger
    // multiplication (measured: an 80k-supernode chain flood never
    // finished). 25 rounds here complete instantly and every
    // checkpoint's estimate stays <= the Long.MaxValue cap.
    import CheckpointScope.Scoped
    var df = spark.range(1000).toDF("id").scopedCheckpoint()
    val cap = BigInt(Long.MaxValue)
    for (r <- 1 to 25) {
      val prev = df
      df = df.as("a").join(df.as("b"), col("a.id") === col("b.id"))
        .select(col("a.id")).scopedCheckpoint()
      CheckpointScope.release(prev)
      val st = df.queryExecution.analyzed.stats
      assert(st.sizeInBytes <= cap, s"round $r: ${st.sizeInBytes}")
    }
    assert(df.count() === 1000L)
    CheckpointScope.release(df)
  }

  test("CheckpointScope.releaseAll frees result-lineage checkpoint blocks after materialization") {
    import spark.implicits._
    // settle: evict anything prior suites left behind so the baseline is clean
    CheckpointScope.releaseAll()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val rdds0 = spark.sparkContext.getPersistentRDDs.size
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (3L, "completely different content with no shared passages at all here now"),
      (4L, "prefix words then the quick brown fox jumps over the lazy dog again and again and again")
    ).toDF("doc_id", "text")
    // span dedup + clusters: both checkpoint intermediates AND leave
    // result-lineage checkpoints (signal tables, final CC labels)
    val spanned = Dedup.spanDedup(docs, k = 5)
    val clustered = Dedup.clusters(docs)
    assert(spanned.count() == 4 && clustered.count() >= 2)
    // results are materialized; before the hook, lineage blocks are live
    assert(CheckpointScope.liveCount > 0,
      "expected live result-lineage checkpoints before releaseAll")
    CheckpointScope.releaseAll()
    assert(CheckpointScope.liveCount == 0)
    // give the async (blocking=false) evictions a moment, then confirm
    // the block manager is back at baseline — the round-10 leak shape
    val deadline = System.nanoTime() + 10e9.toLong
    while (spark.sparkContext.getPersistentRDDs.size > rdds0 &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.size <= rdds0)
  }

  test("incrementalKeepers drops exact and near-dups of the prior corpus, keeps intra-batch dups") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val prior = Seq(
      (1L, base),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (10L, base),                  // exact copy of prior 1 → dropped
      (11L, base + " uniform"),     // near-dup of prior 1 (J = 18/19) → dropped
      (12L, "completely different words about weather patterns today"),
      (13L, "completely different words about weather patterns today") // intra-batch dup: kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalKeepers(newBatch, prior)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 13L))
    // the bloom-prefiltered at-scale path is value-identical
    assert(Dedup.incrementalKeepersAtScale(newBatch, prior)
      .collect().map(_.getLong(0)).toSet == kept)
    // ... including when the incoming batch is empty (empty blooms)
    assert(Dedup.incrementalKeepersAtScale(
      newBatch.limit(0), prior).collect().isEmpty)
  }

  test("lshRecall: identical documents are always candidates (recall 1000); " +
    "empty truth reports the sentinel") {
    import spark.implicits._
    // 10 duplicate pairs of distinct 5-word texts: every pair is a
    // true Jaccard-1 near-dup AND — identical shingle sets, identical
    // signatures — collides in EVERY band, so recall is exactly 1000
    val dups = (0 until 10).flatMap { i =>
      val txt = s"alpha$i beta$i gamma$i delta$i epsilon$i"
      Seq((i * 2L, txt), (i * 2L + 1, txt))
    }.toDF("doc_id", "text")
    val r = Dedup.lshRecall(dups).collect()(0)
    assert((r.getLong(0), r.getLong(2), r.getLong(3)) === (10L, 10L, 1000L))
    // all-distinct corpus: no true pairs -> the 1000 sentinel, not a
    // division by zero
    val uniq = (0 until 8).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d")).toDF("doc_id", "text")
    val r2 = Dedup.lshRecall(uniq).collect()(0)
    assert((r2.getLong(0), r2.getLong(3)) === (0L, 1000L))
  }

  test("containmentPairs fires on quotes symmetric Jaccard misses") {
    import spark.implicits._
    // doc 1: 10 words -> 8 shingles; doc 2 quotes its first 4 words
    // (2 shingles, BOTH inside doc 1): containment of the smaller side
    // = 2/2 = 1000 permille, but Jaccard = 2/8... wait 2/(8+2-2) = 1/4
    // -> jaccardPairs at 1/2 must miss it. Doc 3 shares one shingle
    // with doc 1 (1 < 9/10 of its 4) -> no pair.
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d"),
      (3L, "a b c x y z")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, 9, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === Set((1L, 2L, 2L, 8L, 2L, 250L, 1000L)))
    assert(Dedup.jaccardPairs(docs, 1, 2).collect().isEmpty)
  }
}
