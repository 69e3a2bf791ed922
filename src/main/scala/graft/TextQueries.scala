package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cooccur, Dedup, Search, TextAnalysis}

/**
 * Text-analysis + deduplication query inventory over `documents`
 * (LLM-pipeline extensions; SURVEY §7.1 step 6). The DuckDB oracles
 * re-implement the full pipelines — including MinHash/SimHash — in pure
 * SQL: both engines derive hashes from md5, so even the sketching
 * operators are hash-match gated, not just row-count gated.
 */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  // private[graft]: dedup_multimodal's engine side (EmbeddingQueries)
  // must use the SAME text-cluster parameters its oracle embeds via
  // recursiveSigCte/clusterCte — one source of truth, no coincidence
  private[graft] val NumHashes = 16
  private[graft] val Bands = 4
  private[graft] val RowsPerBand = 4
  // skew cap for the exact-Jaccard inverted-index join (see
  // Dedup.jaccardPairs): shingles in more than this many documents are
  // stop-shingles and excluded from the join (mirrored in the oracle)
  private val MaxShingleDf = 100

  /** NFC fixture marker: decomposed e\u0301, n\u0303, A\u030A next to
    * their precomposed forms (same Scala string feeds the gate AND the
    * oracle SQL, so both engines see identical bytes). */
  private val NfcMarker = "cafe\u0301 n\u0303 A\u030A \u00e9\u00f1\u00c5"
  // segment (pseudo-line) length for the line-level dedup gates: short
  // enough that the sf fixtures actually contain cross-document repeats
  private val SegLen = 5
  // minimum duplicated-span length (in tokens) for the exact-substring
  // span dedup — same fixture consideration as SegLen
  private val SpanK = 5
  // minimum duplicated-span length (in CLEANED CHARACTERS) for the
  // character-level variant — ~4 words' worth of [a-z0-9] content
  private val SpanCharsK = 20
  // iterative BPE gate rounds (the oracle unrolls one CTE stage per
  // round, so keep it small-ish)
  private val BpeRounds = 8
  // byte-level BPE fixture: reserved separator + per-doc mixed-script
  // suffix (Cyrillic / Greek / kana / accented Latin — all invariant
  // under lower() in both engines), single source of truth for the
  // Spark queries AND the DuckDB oracle CTE
  private val BpeSpecial = "<|sep|>"
  private val MixedSuffixes = Seq("данные", "δεδομένα", "データ", "résumé")
  // unigram-LM tokenizer config: seed vocabulary size, max piece
  // length, and the per-round multi-piece keep sizes (2 Viterbi-EM
  // prune rounds; the oracle unrolls one dp+path recursion pair per
  // round, so keep the round count small like BpeRounds)
  private val UniSeedN = 40
  private val UniMaxLen = 4
  private val UniKeep = Seq(24, 16)

  /** The documents table with the mixed-script + special-token
    * augmentation the byte-level BPE gates run on. */
  private def augDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text",
      concat(col("text"), lit(s" $BpeSpecial "),
        element_at(array(MixedSuffixes.map(lit): _*),
          (col("doc_id") % 4 + 1).cast("int"))))

  /** The same augmentation as a DuckDB CTE (named `adocs`). */
  private def augDocsCte: String = {
    val arr = MixedSuffixes.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""adocs AS (SELECT doc_id,
  text || ' $BpeSpecial ' || ($arr)[CAST(doc_id % 4 + 1 AS INT)] AS text
  FROM documents)"""
  }

  /** Retrieval fixture: the driver corpus is ~31 near-universal terms
    * (df ≈ 0.78·N), which BOTH true BM25 idf and the engine's log2
    * quantization correctly zero — so document retrieval over the raw
    * table is degenerate. Append two topic layers with a real df
    * spectrum (`ta<doc%61>` df ≈ N/61 → idf2 = 5, `tb<doc%13>`
    * df ≈ N/13 → idf2 = 3; even docs carry the fine topic twice so tf
    * saturation is exercised). Deterministic, replayed verbatim by the
    * oracle CTE. */
  private[graft] def retDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text",
      concat(col("text"),
        format_string(" ta%d tb%d", col("doc_id") % 61, col("doc_id") % 13),
        when(col("doc_id") % 2 === 0,
          format_string(" ta%d", col("doc_id") % 61)).otherwise(lit(""))))

  /** [[retDocs]] as a DuckDB CTE (named `rdocs`). */
  private val retDocsCte: String =
    """rdocs AS (SELECT doc_id,
  text || ' ta' || (doc_id % 61) || ' tb' || (doc_id % 13) ||
    (CASE WHEN doc_id % 2 = 0 THEN ' ta' || (doc_id % 61) ELSE '' END) AS text
  FROM documents)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats"  -> ((s, dir) => TextAnalysis.stats(docs(s, dir))),
    // Unicode NFC canonical composition (the pre-hash normalization
    // every multilingual pipeline runs): the fixture appends DECOMPOSED
    // e/n/A + combining marks next to their precomposed forms — the
    // engine's codegen java.text.Normalizer expression must agree with
    // DuckDB's independent utf8proc implementation on the composed
    // string AND the character counts (which shrink under NFC)
    "text_nfc" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"),
        concat(col("text"), lit(" " + NfcMarker)).as("raw"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("raw_chars"),
        graft.functions.GraftFunctions.nfc_normalize(col("raw")).as("nfc"))
      .withColumn("nfc_chars", length(col("nfc")).cast("long"))),
    "lang_id"     -> ((s, dir) => TextAnalysis.langId(docs(s, dir))),
    "fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(docs(s, dir))),
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    // exact 3-shingle Jaccard >= 1/2 — isolates the planted near-dups
    "dedup_near_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), 1, 2, maxDf = MaxShingleDf)),
    // asymmetric containment >= 9/10 of the SMALLER side over the
    // quote-augmented corpus: every 40th document gains a 12-word
    // quote twin (doc_id + 1e6) whose shingles are a strict subset of
    // its source's — high containment, low Jaccard, invisible to
    // dedup_near_pairs
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(quoteAugDocs(s, dir), 9, 10,
        maxDf = MaxShingleDf)),
    "minhash_signatures" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), NumHashes)),
    "lsh_candidates" -> ((s, dir) =>
      Dedup.lshCandidates(Dedup.minhashSignatures(docs(s, dir), NumHashes),
        Bands, RowsPerBand)),
    // APPROXIMATION QUALITY, oracle-gated like the ann_*_recall gates:
    // recall of the banded-LSH candidate generator against the exact
    // Jaccard>=1/2 ground truth (both already gated individually) —
    // the number a pipeline tunes bands/rows against before trusting
    // LSH at a scale where exact pairing is unaffordable
    "lsh_recall" -> ((s, dir) =>
      Dedup.lshRecall(docs(s, dir), 1, 2, NumHashes, Bands, RowsPerBand,
        maxDf = MaxShingleDf)),
    "simhash" -> ((s, dir) => Dedup.simhash(docs(s, dir))),
    "simhash_near_pairs" -> ((s, dir) => Dedup.simhashNearPairs(docs(s, dir), 8)),
    // per-document top-5 distinctive terms (integer tf-idf surrogate)
    "tfidf_topk" -> ((s, dir) => TextAnalysis.tfidfTopK(docs(s, dir), 5)),
    // the retrieval upgrade over tfidf: saturated tf + length
    // normalization + log2-quantized integer idf (ubiquitous terms
    // score exactly zero)
    "bm25_topk" -> ((s, dir) => TextAnalysis.bm25TopK(docs(s, dir), 5)),
    // document RETRIEVAL: top-k documents per query by summed BM25 over
    // the topic-augmented corpus; each query is every 29th document's
    // own two topic terms plus one near-universal word (which the
    // zero-idf filter must drop)
    "bm25_doc_topk" -> ((s, dir) =>
      TextAnalysis.bm25DocTopK(retQueries(s, dir), retDocs(s, dir), 10)),
    // inverted-index STORE lifecycle (the reference's index-build idea
    // on the text surface): build the term-range-clustered postings
    // store, serve the same retrieval from it, and emit the direct and
    // served aggregates as two phases — the oracle's one-shot replay
    // must equal BOTH, proving the materialization result-invisible
    "postings_equiv" -> ((s, dir) => {
      val d = retDocs(s, dir)
      val qs = retQueries(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-postings").toString
      graft.operators.PostingsStore.build(d, tmp)
      def summarize(r: org.apache.spark.sql.DataFrame, phase: String) =
        r.agg(count(lit(1)).as("n_rows"),
            coalesce(sum("score_e6"), lit(0L)).as("score_sum"),
            coalesce(sum(col("doc_id") * col("rank")), lit(0L)).as("dr_sum"),
            coalesce(sum("n_terms"), lit(0L)).as("terms_sum"))
          .select(lit(phase).as("phase"), col("n_rows"), col("score_sum"),
            col("dr_sum"), col("terms_sum"))
      val out = summarize(TextAnalysis.bm25DocTopK(qs, d, 10), "direct")
        .unionByName(summarize(
          graft.operators.PostingsStore.bm25DocTopK(s, tmp, qs, 10), "served"))
      // eager: the store tree must be deletable before returning
      val rows = out.collect().toSeq
      val outSchema = out.schema
      graft.operators.PostingsStore.drop(s, tmp)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    }),
    // document takedown through the text index: serve after logical
    // delete and again after the physical fold, both against the
    // filtered-corpus replay — a deleted doc must vanish from ranks AND
    // stop counting in df/n_docs/avgdl at every phase
    "postings_delete_equiv" -> ((s, dir) => {
      val d = retDocs(s, dir)
      val qs = retQueries(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-postings-del").toString
      graft.operators.PostingsStore.build(d, tmp)
      def summarize(r: org.apache.spark.sql.DataFrame, phase: String) =
        r.agg(count(lit(1)).as("n_rows"),
            coalesce(sum("score_e6"), lit(0L)).as("score_sum"),
            coalesce(sum(col("doc_id") * col("rank")), lit(0L)).as("dr_sum"),
            coalesce(sum("n_terms"), lit(0L)).as("terms_sum"))
          .select(lit(phase).as("phase"), col("n_rows"), col("score_sum"),
            col("dr_sum"), col("terms_sum"))
      // each phase collects EAGERLY before the next store mutation —
      // a lazy plan would read trees the following delete/compact
      // replaces (stale FileIndex -> missing-file read failure)
      def phase(name: String) = {
        val out = summarize(
          graft.operators.PostingsStore.bm25DocTopK(s, tmp, qs, 10), name)
        (out.collect().toSeq, out.schema)
      }
      val (pre, outSchema) = phase("pre")
      graft.operators.PostingsStore.deleteDocs(s, tmp,
        d.filter(col("doc_id") % 5 === 0).select("doc_id"), 0L)
      val (deleted, _) = phase("deleted")
      graft.operators.PostingsStore.compact(s, tmp)
      val (compacted, _) = phase("compacted")
      val rows = pre ++ deleted ++ compacted
      graft.operators.PostingsStore.drop(s, tmp)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    }),
    // snapshot (time-travel) reads over the postings store: two batch
    // appends (ops 1: even docs, 2: odd docs) then a takedown (op 3,
    // %5 docs) — serving AS OF each bound must replay the one-shot
    // retrieval over exactly the corpus that existed then, and the
    // live read equals the last bound (every phase hash-checked
    // against the corresponding filtered-corpus oracle)
    "postings_asof" -> ((s, dir) => {
      val d = retDocs(s, dir)
      val qs = retQueries(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-postings-asof").toString
      graft.operators.PostingsStore.appendBatch(
        d.filter(col("doc_id") % 2 === 0), tmp, 1L)
      graft.operators.PostingsStore.appendBatch(
        d.filter(col("doc_id") % 2 =!= 0), tmp, 2L)
      graft.operators.PostingsStore.deleteDocs(s, tmp,
        d.filter(col("doc_id") % 5 === 0).select("doc_id"), 3L)
      // all four phases are READ-ONLY over the same final store state
      // (every mutation precedes them), so they fold into ONE collect:
      // the per-phase broadcast chains (stats → positive-idf df table,
      // query terms) build CONCURRENTLY on the broadcast thread pool
      // instead of serializing 4 × 3 job rounds (guide §2.6 — overlap
      // independent jobs; r20). Union branch order pins the row order,
      // exactly the postings_equiv / ann_store_asof spelling.
      val out = summarizeRetrieval(
          graft.operators.PostingsStore.bm25DocTopKAsOf(s, tmp, qs, 10, 1L), "asof1")
        .unionByName(summarizeRetrieval(
          graft.operators.PostingsStore.bm25DocTopKAsOf(s, tmp, qs, 10, 2L), "asof2"))
        .unionByName(summarizeRetrieval(
          graft.operators.PostingsStore.bm25DocTopKAsOf(s, tmp, qs, 10, 3L), "asof3"))
        .unionByName(summarizeRetrieval(
          graft.operators.PostingsStore.bm25DocTopK(s, tmp, qs, 10), "live"))
      val rows = out.collect().toSeq
      val outSchema = out.schema
      graft.operators.PostingsStore.drop(s, tmp)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    }),
    // the compact-then-append lifecycle (the NORMAL shape of a store
    // that compacts periodically while ingest continues): offline base
    // + one batch, a fold, then a post-fold append — each serve must
    // union every layer on disk (the r17 layout silently dropped the
    // compacted base once a batch dir appeared)
    "postings_compact_append" -> ((s, dir) => {
      val d = retDocs(s, dir)
      val qs = retQueries(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-postings-ca").toString
      graft.operators.PostingsStore.build(d.filter(col("doc_id") % 3 === 0), tmp)
      graft.operators.PostingsStore.appendBatch(
        d.filter(col("doc_id") % 3 === 1), tmp, 1L)
      // each phase collects EAGERLY before the next store mutation
      // (stale FileIndex otherwise — the postings_delete_equiv rule)
      def phase(name: String) = {
        val out = summarizeRetrieval(
          graft.operators.PostingsStore.bm25DocTopK(s, tmp, qs, 10), name)
        (out.collect().toSeq, out.schema)
      }
      val (mixed1, outSchema) = phase("mixed1")
      graft.operators.PostingsStore.compact(s, tmp)
      val (folded, _) = phase("folded")
      graft.operators.PostingsStore.appendBatch(
        d.filter(col("doc_id") % 3 === 2), tmp, 2L)
      val (mixed2, _) = phase("mixed2")
      val rows = mixed1 ++ folded ++ mixed2
      graft.operators.PostingsStore.drop(s, tmp)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    }),
    // RE-INDEX (document update, the re-crawl lifecycle): takedown at
    // op 1 then appendBatch of UPDATED text at op 2 — the marker kills
    // only versions ≤ its op, so the new version serves; stats track
    // exactly (delete subtracts the old length, the batch partial adds
    // the new); the fold is result-invisible over the whole cycle
    "postings_reindex" -> ((s, dir) => {
      val d = retDocs(s, dir)
      val qs = retQueries(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-postings-reidx").toString
      graft.operators.PostingsStore.build(d, tmp)
      def phase(name: String) = {
        val out = summarizeRetrieval(
          graft.operators.PostingsStore.bm25DocTopK(s, tmp, qs, 10), name)
        (out.collect().toSeq, out.schema)
      }
      val (pre, outSchema) = phase("pre")
      graft.operators.PostingsStore.deleteDocs(s, tmp,
        d.filter(col("doc_id") % 10 === 0).select("doc_id"), 1L)
      val (deleted, _) = phase("deleted")
      graft.operators.PostingsStore.appendBatch(
        d.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            concat(col("text"), lit(" updza updzb")).as("text")), tmp, 2L)
      val (reindexed, _) = phase("reindexed")
      graft.operators.PostingsStore.compact(s, tmp)
      val (folded, _) = phase("folded")
      val rows = pre ++ deleted ++ reindexed ++ folded
      graft.operators.PostingsStore.drop(s, tmp)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    }),
    // TERM purge (the PII/secret-token workflow, the vocabulary-axis
    // takedown): after purgeTerms the purged terms stop being served —
    // df and per-query n_terms shift, corpus stats (doc lengths at
    // index time) do NOT — and the physical fold must serve the same
    // term-filtered replay the marker read does
    "postings_term_purge" -> ((s, dir) => {
      val d = retDocs(s, dir)
      val qs = retQueries(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-postings-purge").toString
      graft.operators.PostingsStore.build(d, tmp)
      def phase(name: String) = {
        val out = summarizeRetrieval(
          graft.operators.PostingsStore.bm25DocTopK(s, tmp, qs, 10), name)
        (out.collect().toSeq, out.schema)
      }
      val (pre, outSchema) = phase("pre")
      import s.implicits._
      graft.operators.PostingsStore.purgeTerms(s, tmp,
        Seq("ta7", "tb3").toDF("term"), 0L)
      val (purged, _) = phase("purged")
      graft.operators.PostingsStore.compact(s, tmp)
      val (folded, _) = phase("folded")
      val rows = pre ++ purged ++ folded
      graft.operators.PostingsStore.drop(s, tmp)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), outSchema)
    }),
    // BPE-style pre-tokenizer piece counts (engine-exact, no heuristic)
    "token_pieces" -> ((s, dir) => TextAnalysis.tokenPieces(docs(s, dir))),
    // winnowing (rolling-hash) local fingerprints, k=5 w=4
    "winnow_fp" -> ((s, dir) => TextAnalysis.winnowFingerprints(docs(s, dir), 5, 4)),
    // passage-overlap mining over the winnow index (>= 3 shared fps)
    "winnow_pairs" -> ((s, dir) =>
      TextAnalysis.winnowPairs(docs(s, dir), 5, 4, 3, MaxShingleDf)),
    // bigram-LM predictability score (integer CCNet-perplexity stand-in)
    "lm_score" -> ((s, dir) => TextAnalysis.lmScore(docs(s, dir))),
    // exact-substring span removal (Lee et al. 2022 ExactSubstr at
    // k-gram granularity): duplicated >= SpanK-token passages vanish
    // from every document but their first (keeper) document
    "span_dedup" -> ((s, dir) => Dedup.spanDedup(docs(s, dir), SpanK, 2)),
    // character-level duplicate coverage over the punctuation-stripped
    // stream — catches separator-variant copies word grams miss
    "span_dedup_chars" -> ((s, dir) => Dedup.spanDedupChars(docs(s, dir), SpanCharsK, 2)),
    // winnow-prefiltered APPROXIMATE span dedup: exact for duplicated
    // spans >= k+w-1 tokens, candidates-only positioned join — the
    // scale path for mostly-distinct corpora. maxCandidateFrac = 1.0
    // pins the PURE approximate path: the oracle models winnow
    // semantics with no bail-out, so the adaptive exact fallback must
    // never engage in the gate regardless of fixture duplication rate
    "span_dedup_winnow" -> ((s, dir) =>
      Dedup.spanDedupApprox(docs(s, dir), SpanK, 2, 4, maxCandidateFrac = 1.0)),
    // the char-granularity twin at the PRODUCTION default bail-out
    // (maxCandidateFrac = 0.5): at oracle scale (sf0.01) the fixture
    // sits at ~42% candidacy, under the threshold, so the pure
    // approximate path runs and the oracle models it (zero coverage
    // for non-candidates); at bench scale (sf0.1) the same fixture
    // crosses ~85% candidacy and the operator takes the adaptive
    // exact bail-out it would take in production — an 85%-duplicated
    // corpus is exactly where a prefilter CANNOT pay, and paying only
    // the signal-pass floor there (instead of re-tokenizing nearly
    // every candidate) is the operator working as designed. The
    // prefilter's win case is pinned by span_dedup_chars_winnow_sparse
    "span_dedup_chars_winnow" -> ((s, dir) =>
      Dedup.spanDedupCharsApprox(docs(s, dir), SpanCharsK, 2, 4, maxCandidateFrac = 0.5)),
    // the mostly-distinct corpus the winnow prefilter is FOR: ~90% of
    // docs carry doc-salted generated text (no two docs share a 20-char
    // window — every token embeds its doc_id), ~10% share one literal
    // passage; candidacy stays ~10% at every sf, the positioned join
    // runs over candidates only, and the approximate twin beats the
    // exact one on the SAME fixture — the bench row the duplication-
    // heavy documents fixture structurally cannot show
    "span_dedup_chars_sparse" -> ((s, dir) =>
      Dedup.spanDedupChars(sparseDocs(s, dir), SpanCharsK, 2)),
    "span_dedup_chars_winnow_sparse" -> ((s, dir) =>
      Dedup.spanDedupCharsApprox(sparseDocs(s, dir), SpanCharsK, 2, 4)),
    // BPE tokenizer-training primitive: corpus-weighted adjacent
    // char-pair counts over the distinct-word table, top-k candidates
    "bpe_merges" -> ((s, dir) => TextAnalysis.bpeMergeCandidates(docs(s, dir), 20)),
    // FULL iterative BPE training: each round applies the heaviest
    // merge and recounts over the rewritten symbol table (driver-bounded
    // loop, one vocabulary-scale aggregate per round)
    "bpe_train" -> ((s, dir) => TextAnalysis.bpeTrain(docs(s, dir), BpeRounds)),
    // tokenizer APPLICATION: replay the trained merge list over every
    // word (plan-literal folds, zero shuffle) — per-doc true token
    // counts under the corpus's own tokenizer
    "bpe_encode" -> ((s, dir) => {
      val merges = TextAnalysis.bpeMerges(docs(s, dir), BpeRounds)
      TextAnalysis.bpeEncode(docs(s, dir), merges)
    }),
    // WordPiece TRAINING (likelihood-scored merges): same merge
    // machinery as bpe_train but the winner maximizes the quantized
    // score floor(n·1e12/(c(l)·c(r))) — already-rare symbol pairs can
    // beat ubiquitous ones (the BERT-tokenizer selection rule)
    "wordpiece_train" -> ((s, dir) =>
      TextAnalysis.wordpieceTrain(docs(s, dir), BpeRounds)),
    // WordPiece ENCODE: greedy longest-match-first walk under the
    // trained vocabulary (alphabet + merges, digits excluded) over the
    // corpus augmented with one digit-bearing word per document — the
    // [UNK] whole-word fallback fires exactly once per doc
    "wordpiece_encode" -> ((s, dir) => {
      val vocab = TextAnalysis.wordpieceVocab(docs(s, dir), BpeRounds)
      TextAnalysis.wordpieceEncode(wpAugDocs(s, dir), vocab)
    }),
    // BYTE-level BPE training over the mixed-script fixture (each doc
    // gains a non-ASCII suffix and a reserved separator): merges are
    // two-hex-char byte symbols, the special token contributes nothing
    "bpe_train_bytes" -> ((s, dir) =>
      TextAnalysis.bpeTrainBytes(augDocs(s, dir), BpeRounds, Seq(BpeSpecial))),
    // byte-fallback ENCODING with special tokens: every mixed-script
    // word decomposes into the closed byte alphabet (nothing drops),
    // the separator counts as exactly one piece and bypasses merges
    "bpe_encode_bytes" -> ((s, dir) => {
      val aug = augDocs(s, dir)
      val merges = TextAnalysis.bpeMerges(aug, BpeRounds, Seq(BpeSpecial),
        byteMode = true)
      TextAnalysis.bpeEncodeBytes(aug, merges, Seq(BpeSpecial))
    }),
    // unigram-LM (SentencePiece-style) tokenizer TRAINING on the
    // mixed-script fixture: alphabet + top-N substring seeds, two
    // Viterbi-EM prune rounds — all exact-integer (fewest pieces,
    // ties to the largest count sum), so the final vocabulary
    // hash-matches the oracle's recursive-CTE replay
    "unigram_train" -> ((s, dir) =>
      TextAnalysis.unigramTrain(augDocs(s, dir), UniSeedN, UniMaxLen, UniKeep)),
    // tokenizer APPLICATION: optimal Viterbi piece counts per document
    // under the trained vocabulary (fused codegen DP, zero shuffle)
    "unigram_encode" -> ((s, dir) => {
      val aug = augDocs(s, dir)
      val vocab = TextAnalysis.unigramVocabulary(aug, UniSeedN, UniMaxLen, UniKeep)
      TextAnalysis.unigramEncode(aug, vocab, UniMaxLen)
    }),
    // train/val split-leakage audit: deterministic hash split, then
    // every LSH-verified near-dup pair that CROSSES the split boundary
    // (the eval-contamination a random split silently ships)
    "split_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      val sp = d.select(col("doc_id"), expr(
        """if(cast(conv(substr(md5(concat('split:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 10 < 9,
              'train', 'val')""").as("split"))
      Dedup.lshNearPairs(d, 1, 2, 3, NumHashes, Bands, RowsPerBand)
        .select("id_a", "id_b")
        .join(sp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "split_a"), "id_a")
        .join(sp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "split_b"), "id_b")
        .filter(col("split_a") =!= col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b")
    }),
    // corpus-level token frequency, top-k
    "word_freq" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word")).limit(20)),
    // the Gopher rule battery: word count, mean word length, alphabetic
    // fraction, symbol ratio, stopword count, duplicate-line fraction,
    // bullet/ellipsis line ratios + composite pass flag
    "gopher_quality" -> ((s, dir) =>
      TextAnalysis.gopherQuality(docs(s, dir), segLen = SegLen)),
    // quality-gated survivor set — the filtering step of a data pipeline
    "quality_filter" -> ((s, dir) =>
      TextAnalysis.stats(docs(s, dir))
        .filter(col("n_tokens") >= 30 && col("quality_e3") >= 500)
        .select("doc_id")),
    // fixed-window token chunking with overlap (window 50, stride 40)
    "chunk_docs" -> ((s, dir) => TextAnalysis.chunk(docs(s, dir), 50, 40)),
    // the composed training-data pipeline: quality gate, then drop the
    // higher-id member of every near-dup pair (deterministic keeper
    // rule). Near-dups come from the 100 TB-shape path: banded-LSH
    // candidates + exact Jaccard re-verification of candidate pairs
    // only — no join in the pipeline is keyed on a shingle.
    "pipeline_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      val survivors = TextAnalysis.stats(d)
        .filter(col("n_tokens") >= 30 && col("quality_e3") >= 500)
        .select("doc_id", "n_tokens")
      val dupLosers = Dedup.lshNearPairs(d, 1, 2, 3, NumHashes, Bands, RowsPerBand)
        .select(col("id_b").as("doc_id")).distinct()
      survivors.join(dupLosers, Seq("doc_id"), "left_anti")
    }),
    // transitive duplicate resolution: LSH-verified near-dup pairs →
    // connected components → (doc_id, cluster_id = min reachable id).
    // All three cluster consumers (here, dedup_keepers, pipeline_curate)
    // read the ONE materialized-per-process cluster table — the
    // dedup-once-consume-many shape of a real corpus build
    "dedup_clusters" -> ((s, dir) =>
      Dedup.sharedClusters(docs(s, dir), dir, 1, 2, 3, NumHashes, Bands, RowsPerBand)),
    // corpus survivors after cluster-canonical keeper selection: unlike
    // pipeline_corpus's pairwise loser rule, a~b~c collapses to ONE doc
    "dedup_keepers" -> ((s, dir) =>
      Dedup.keepersFrom(docs(s, dir),
        Dedup.sharedClusters(docs(s, dir), dir, 1, 2, 3, NumHashes, Bands, RowsPerBand))),
    // quality-aware keeper selection: every cluster ships its BEST
    // member (lexical-diversity score, ties to lowest id) instead of
    // the minimum id — the keeper rule a production dedup wants
    "dedup_keepers_best" -> ((s, dir) => {
      val d = docs(s, dir)
      val scores = TextAnalysis.stats(d)
        .select(col("doc_id"), col("quality_e3").as("score"))
      Dedup.keepersByScore(d,
        Dedup.sharedClusters(d, dir, 1, 2, 3, NumHashes, Bands, RowsPerBand), scores)
    }),
    // incremental (cross-run) dedup: a fourth of the corpus plays the
    // incoming batch, deduped against the other three quarters playing
    // yesterday's shipped corpus — exact-hash anti-join + LSH-verified
    // cross near-dup anti-join, never prior×prior
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalKeepers(
        d.filter(col("doc_id") % 4 === 3), d.filter(col("doc_id") % 4 < 3),
        1, 2, 3, NumHashes, Bands, RowsPerBand)
    }),
    // the same incremental dedup with batch-side bloom filters reducing
    // the prior corpus at its scan (value-identical by construction —
    // bloom misses cannot match, positives are exactly re-verified)
    "dedup_incremental_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalKeepersAtScale(
        d.filter(col("doc_id") % 4 === 3), d.filter(col("doc_id") % 4 < 3),
        1, 2, 3, NumHashes, Bands, RowsPerBand)
    }),
    // line-level dedup (C4/CCNet-style): segments duplicated across
    // documents are removed everywhere but their first occurrence and
    // the cleaned text is reassembled — catches shared boilerplate that
    // document-level near-dup detection can't
    "segment_shared" -> ((s, dir) => Dedup.segmentShared(docs(s, dir), SegLen, 2)),
    "segment_dedup" -> ((s, dir) => Dedup.segmentDedup(docs(s, dir), SegLen, 2)),
    // the full nightly-batch composition: the incoming quarter is
    // deduplicated WITHIN itself (cluster-canonical keepers — a~b~c
    // collapses to the minimum member) AND against the shipped prior
    // corpus (exact + LSH-verified cross anti-joins); a document ships
    // only if it survives both. The fused operator signs and
    // shingle-sets the batch ONCE for both stages (Dedup.nightly).
    "pipeline_nightly" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.nightly(d.filter(col("doc_id") % 4 === 3), d.filter(col("doc_id") % 4 < 3),
        1, 2, 3, NumHashes, Bands, RowsPerBand)
    }),
    // exact phrase search (positional-postings intersection): every
    // 37th document's tokens 2..4 play a quoted query; occurrences
    // surface wherever the corpus repeats the phrase — the token-ORDER
    // retrieval companion to bm25_doc_topk's bag-of-words ranking
    "phrase_search" -> ((s, dir) => {
      val d = docs(s, dir)
      val qs = d.filter(col("doc_id") % 37 === 1)
        .filter(size(TextAnalysis.tokens(col("text"))) >= 4)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 2, 3))
            .as("phrase"))
      Search.phraseOccurrences(qs, d)
    }),
    // document-level PMI co-occurrence over the top-40 df terms
    // (collocation mining; the quadratic pair door is closed by the
    // bounded vocabulary — <= 40 terms per doc enter the self-join)
    "pmi_pairs" -> ((s, dir) =>
      Cooccur.pmiPairs(docs(s, dir), topN = 40, minPairCount = 5L))
  )

  /** Oracle twin of [[TextAnalysis.langId]]: doc 1..3-gram ranks, the
    * VALUES profile table generated from the SAME [[TextAnalysis
    * .langProfiles]] literals, out-of-place distance, min-distance
    * language with lexicographic tie-break. */
  private def langIdOracle: String = {
    val profRows = TextAnalysis.langProfiles.flatMap { case (l, prof) =>
      prof.map { case (g, r) => s"('$l', '$g', $r)" }
    }.mkString(",\n  ")
    val langRows = TextAnalysis.langProfiles
      .map { case (l, _) => s"('$l')" }.mkString(", ")
    s"""WITH c AS (SELECT doc_id, ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS c FROM documents),
g AS (
  SELECT doc_id, unnest(list_transform(range(1, length(c) + 1), i -> substr(c, CAST(i AS INT), 1))) AS g FROM c
  UNION ALL
  SELECT doc_id, unnest(list_transform(range(1, length(c)), i -> substr(c, CAST(i AS INT), 2))) AS g FROM c
  UNION ALL
  SELECT doc_id, unnest(list_transform(range(1, length(c) - 1), i -> substr(c, CAST(i AS INT), 3))) AS g FROM c),
cnt AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2),
rk AS (SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g) AS r FROM cnt),
top AS (SELECT doc_id, g, r FROM rk WHERE r <= ${TextAnalysis.LangDocTopK}),
prof(lang, g, pr) AS (VALUES
  $profRows),
langs(lang) AS (VALUES $langRows),
d AS (SELECT t.doc_id, l.lang, SUM(coalesce(abs(t.r - p.pr), ${TextAnalysis.LangProfileSize})) AS dist,
    CAST(count(*) AS BIGINT) AS ng
  FROM top t CROSS JOIN langs l
  LEFT JOIN prof p ON p.lang = l.lang AND p.g = t.g
  GROUP BY 1, 2),
best AS (SELECT doc_id, lang, dist, ng, row_number() OVER (PARTITION BY doc_id ORDER BY dist, lang) AS rn FROM d)
SELECT doc_id,
  CASE WHEN dist * 10 >= ng * ${TextAnalysis.LangProfileSize} * 9 THEN 'unknown' ELSE lang END AS lang_pred
FROM best WHERE rn = 1"""
  }

  /** Unrolled-CTE oracle for [[TextAnalysis.bpeTrain]]: stage r counts
    * pairs over the round-r symbol table, picks the (total desc, lhs,
    * rhs) winner, and rewrites via sentinel-bounded string replace. */
  private val BpeSep = "chr(31)"

  /** v1 head of the char-level train oracle (split into characters). */
  private def bpeCharHead: String =
    s"""WITH wds AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM documents),
wf AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wds GROUP BY w),
v1 AS (SELECT $BpeSep || array_to_string(list_transform(range(1, length(w)+1),
    i -> substr(w, CAST(i AS INT), 1)), $BpeSep || $BpeSep) || $BpeSep AS vstr, wc FROM wf)"""

  /** The byte decomposition of word expression `w` as the sentinel-
    * joined vstr (two-hex-char symbols — DuckDB's hex(BLOB) matches
    * Spark's uppercase hex). */
  private def byteVstr(w: String): String =
    s"""$BpeSep || array_to_string(list_transform(range(1, length(hex(encode($w)))//2 + 1),
    i -> substr(hex(encode($w)), CAST(2*i-1 AS INT), 2)), $BpeSep || $BpeSep) || $BpeSep"""

  /** v1 head of the BYTE-level train oracle over the augmented corpus:
    * special-token words are excluded from the statistics (the engine's
    * bpeTrainBytes contract). */
  private def bpeByteHead: String =
    s"""WITH $augDocsCte,
wds AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs),
wf AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wds WHERE w <> '$BpeSpecial' GROUP BY w),
v1 AS (SELECT ${byteVstr("w")} AS vstr, wc FROM wf)"""

  private def bpeTrainOracle(rounds: Int): String =
    bpeTrainOracleCore(bpeCharHead, rounds)

  /** The retrieval query fixture bm25_doc_topk and postings_equiv
    * share: every 29th document's two topic terms + its first word. */
  private[graft] def retQueries(s: SparkSession, dir: String): DataFrame =
    retDocs(s, dir)
      .select(col("doc_id").as("query_id"),
        format_string("ta%d tb%d %s", col("doc_id") % 61, col("doc_id") % 13,
          element_at(TextAnalysis.tokens(col("text")), 1)).as("qtext"))
      .filter(col("query_id") % 29 === 0)

  /** The shared passage of the sparse span-dedup fixture (cleaned
    * length ~100 chars ≥ k+w−1, so winnow-approximate coverage of the
    * copies is exact). */
  private val SparsePassage =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
    "the quiet river flow past the old stone bridge at dawn"

  /** The mostly-distinct corpus the winnow prefilter targets: docs ≡ 0
    * (mod 10) share [[SparsePassage]]; every other doc's text is
    * generated with its doc_id embedded in EVERY token, so no two docs
    * share a [[SpanCharsK]]-char window (a 20-char window always
    * contains a complete `t<id>x<digit>` token) — candidacy stays ~10%
    * at every scale factor and the positioned join runs over
    * candidates only. */
  /** Virtual-id fan-out of the sparse fixture: the text is generated
    * purely from the (virtual) doc id, so the corpus scales past the
    * documents table without changing its statistics. 4× the docs and
    * 160 tokens per unique doc (~20k docs / ~16M chars at sf0.1) is
    * where the exact twin's all-grams shuffle (the work the prefilter
    * skips) dominates the prefilter's own fingerprint pass — at the
    * un-fanned 5k-doc / 40-token size the gate is all fixed cost and
    * the candidate pruning cannot show in the bench. */
  private val SparseFanOut = 4

  private[graft] def sparseDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(sequence(lit(0L), lit(SparseFanOut - 1L))).as("r"),
        col("doc_id"))
      .select((col("doc_id") * SparseFanOut + col("r")).as("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0, lit(SparsePassage))
          .otherwise(expr("array_join(transform(sequence(1, 160), " +
            "i -> concat('t', cast(doc_id as string), 'x', " +
            "cast((i*3 + doc_id*5) % 10 as string))), ' ')"))
          .as("text"))

  /** The exact char-span-dedup oracle, parameterized by the docs
    * source (a table name or FROM-able subquery) so the documents and
    * sparse fixtures replay one SQL body. */
  private def spanCharsExactOracle(docsSrc: String): String =
    s"""WITH c AS (SELECT doc_id, regexp_replace(lower(trim(text)), '[^a-z0-9]', '', 'g') AS clean
  FROM $docsSrc),
h AS (SELECT doc_id, length(clean) AS n,
    list_transform(range(1, length(clean)+1), i -> CAST(ascii(substr(clean, CAST(i AS INT), 1)) AS BIGINT)) AS hs
  FROM c WHERE length(clean) >= 1),
g AS (SELECT doc_id, n,
    CASE WHEN n >= $SpanCharsK THEN list_transform(range(1, n-${SpanCharsK - 2}),
      i -> ${Dedup.spanGramHash(SpanCharsK)})
    ELSE CAST([] AS BIGINT[]) END AS ghs
  FROM h),
occ AS (SELECT DISTINCT doc_id, unnest(ghs) AS gh FROM g),
dup AS (SELECT gh, min(doc_id) AS keeper FROM occ GROUP BY gh HAVING count(*) >= 2),
pos AS (SELECT doc_id, pg.i AS i, pg.gh AS gh FROM (
  SELECT doc_id, unnest(list_transform(range(1, len(ghs)+1),
    i -> {'i': i, 'gh': ghs[i]})) AS pg FROM g)),
ds AS (SELECT p.doc_id, list_sort(list(p.i)) AS ss
  FROM pos p JOIN dup d ON p.gh = d.gh AND p.doc_id <> d.keeper
  GROUP BY p.doc_id),
j AS (SELECT g.doc_id, g.n, coalesce(ds.ss, CAST([] AS BIGINT[])) AS ss
  FROM g LEFT JOIN ds USING (doc_id))
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
  CAST(len(list_filter(range(1, n+1),
    p -> len(list_filter(ss, s -> s <= p AND s >= p - ${SpanCharsK - 1})) > 0)) AS BIGINT) AS n_dup_chars
FROM j"""

  /** The DuckDB twin of [[sparseDocs]], as a FROM-able subquery. */
  private def sparseDocsSql: String =
    s"""(SELECT vid AS doc_id, CASE WHEN vid % 10 = 0 THEN '$SparsePassage'
  ELSE array_to_string(list_transform(range(1, 161),
    i -> 't' || CAST(vid AS VARCHAR) || 'x' ||
         CAST((i*3 + vid*5) % 10 AS VARCHAR)), ' ') END AS text
FROM (SELECT doc_id * $SparseFanOut + r.r AS vid
      FROM documents, (SELECT unnest(range($SparseFanOut)) AS r) r))"""

  /** The per-phase retrieval aggregate the postings store gates share:
    * one row summarizing a served top-k result, so N lifecycle phases
    * hash-compare against N filtered-corpus oracle replays. */
  private def summarizeRetrieval(r: DataFrame, phase: String): DataFrame =
    r.agg(count(lit(1)).as("n_rows"),
        coalesce(sum("score_e6"), lit(0L)).as("score_sum"),
        coalesce(sum(col("doc_id") * col("rank")), lit(0L)).as("dr_sum"),
        coalesce(sum("n_terms"), lit(0L)).as("terms_sum"))
      .select(lit(phase).as("phase"), col("n_rows"), col("score_sum"),
        col("dr_sum"), col("terms_sum"))

  /** The one-row aggregate of a [[bm25DocOracleSqlOver]] CTE — the SQL
    * twin of [[summarizeRetrieval]]. */
  private[graft] def retrievalAggSql(base: String): String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum(score_e6), 0) AS BIGINT) AS score_sum,
  CAST(coalesce(sum(doc_id * rank), 0) AS BIGINT) AS dr_sum,
  CAST(coalesce(sum(n_terms), 0) AS BIGINT) AS terms_sum FROM $base"""

  /** The bm25_doc_topk replay — shared by the direct gate and the
    * postings_equiv wrapper (which aggregates it per phase). */
  private[graft] def bm25DocOracleSql: String = bm25DocOracleSqlOver("TRUE")

  /** [[bm25DocOracleSql]] parameterized by the LIVE-corpus predicate:
    * scoring (dl, n_docs, avgdl, df — everything takedown shifts) runs
    * over `w WHERE $livePred`, while the query fixture `qt` stays over
    * the FULL corpus — the engine's queries don't vanish when their
    * source doc is deleted from the store. `TRUE` is the undeleted
    * corpus; `postings_delete_equiv` replays the takedown with
    * `doc_id % 5 <> 0`. */
  private[graft] def bm25DocOracleSqlOver(livePred: String,
                                          termPred: String = "TRUE",
                                          textExpr: String = "text"): String = {
    import TextAnalysis.{Bm25K1E4 => K1, Bm25K1p1E4 => K1P1, Bm25BE4 => B}
    s"""WITH $retDocsCte,
w AS (SELECT doc_id, regexp_split_to_array(lower(trim($textExpr)), '\\s+') AS ws FROM rdocs),
live AS (SELECT * FROM w WHERE $livePred),
d AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM live),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) // count(*) AS BIGINT) AS avgdl FROM d),
p0 AS (SELECT doc_id, dl, unnest(list_distinct(ws)) AS term, ws FROM d),
p AS (SELECT doc_id, dl, term, CAST(len(list_filter(ws, x -> x = term)) AS BIGINT) AS tf FROM p0
  WHERE $termPred),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term),
qt AS (SELECT doc_id AS query_id,
    unnest(list_distinct(['ta' || (doc_id % 61), 'tb' || (doc_id % 13), ws[1]])) AS term
  FROM w WHERE doc_id % 29 = 0),
sc AS (SELECT qt.query_id, p.doc_id,
    CAST((length(bin(st.n_docs // d.df)) - 1) *
      ((p.tf * $K1P1 * 1000000) //
       (p.tf * 10000 + ($K1 * ((10000 - $B) + ($B * p.dl) // st.avgdl)) // 10000)) AS BIGINT) AS score_e6
  FROM p JOIN dfreq d USING (term) JOIN qt USING (term), st),
agg AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
    CAST(sum(score_e6) AS BIGINT) AS score_e6
  FROM sc WHERE score_e6 > 0 GROUP BY query_id, doc_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_e6 DESC, doc_id) AS rn FROM agg)
SELECT query_id, doc_id, n_terms, score_e6, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= 10"""
  }

  // ---- WordPiece oracle (validated in tools/proto_wordpiece.py) ----

  /** The digit-word augmentation both wordpiece_encode sides share. */
  private def wpAugDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text",
      concat(col("text"), lit(" ref"), (col("doc_id") % 50).cast("string")))

  /** Train CTE chain for the likelihood-scored merge replay: per round,
    * symbol tallies `s$r`, pair tallies `p$r`, the quantized-score
    * argmax `b$r` (HUGEINT floor-division — the engine's BigInt), and
    * the rewritten symbol corpus `v${r+1}`. Everything multi-referenced
    * is MATERIALIZED (v$r feeds three CTEs; default inlining is
    * exponential in rounds and re-opens the parquet per reference). */
  private def wpTrainCtes(rounds: Int): String = {
    val sep = BpeSep
    val head =
      s"""wds AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM documents),
wf AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wds GROUP BY w),
v1 AS MATERIALIZED (SELECT $sep || array_to_string(list_transform(range(1, length(w)+1),
    i -> substr(w, CAST(i AS INT), 1)), $sep || $sep) || $sep AS vstr, wc FROM wf)"""
    val stages = (1 to rounds).map { r =>
      s""",
s$r AS MATERIALIZED (SELECT sym, CAST(sum(wc) AS BIGINT) AS c FROM (
    SELECT wc, unnest(string_split(trim(vstr, $sep), $sep || $sep)) AS sym FROM v$r)
  GROUP BY 1),
p$r AS MATERIALIZED (SELECT s.lhs AS lhs, s.rhs AS rhs, CAST(sum(wc) AS BIGINT) AS total FROM (
    SELECT wc, unnest(list_transform(range(1, len(syms)), j -> {'lhs': syms[j], 'rhs': syms[j+1]})) AS s
    FROM (SELECT wc, string_split(trim(vstr, $sep), $sep || $sep) AS syms FROM v$r))
  GROUP BY 1, 2),
b$r AS MATERIALIZED (SELECT lhs, rhs, total,
    CAST(total::HUGEINT * ${TextAnalysis.WpScale} // (cl.c::HUGEINT * cr.c) AS BIGINT) AS score_q
  FROM p$r JOIN s$r cl ON p$r.lhs = cl.sym JOIN s$r cr ON p$r.rhs = cr.sym
  ORDER BY score_q DESC, lhs, rhs LIMIT 1),
v${r + 1} AS MATERIALIZED (SELECT replace(vstr, $sep || lhs || $sep || $sep || rhs || $sep,
    $sep || lhs || rhs || $sep) AS vstr, wc FROM v$r, b$r)"""
    }.mkString
    head + stages
  }

  private def wordpieceTrainOracle(rounds: Int): String = {
    val rows = (1 to rounds)
      .map(r => s"SELECT CAST($r AS INT) AS round, lhs, rhs, lhs || rhs AS merged, score_q, total FROM b$r")
      .mkString("\nUNION ALL ")
    s"WITH ${wpTrainCtes(rounds)}\n$rows"
  }

  /** Greedy longest-match replay: the per-(word, position) longest
    * vocabulary match is precomputed non-recursively (`mt`), then a
    * recursive walk advances one piece per step — an unmatched position
    * resets the word to one `[UNK]` piece and jumps past the end. */
  private def wordpieceEncodeOracle(rounds: Int): String = {
    val merged = (1 to rounds)
      .map(r => s"SELECT lhs || rhs AS p FROM b$r").mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${wpTrainCtes(rounds)},
alpha AS (SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS p
  FROM wf, unnest(range(1, length(w)+1)) AS t(i)),
vocab AS MATERIALIZED (SELECT p FROM (SELECT p FROM alpha UNION $merged)
  WHERE NOT regexp_matches(p, '[0-9]')),
adocs AS (SELECT doc_id, text || ' ref' || CAST(doc_id % 50 AS VARCHAR) AS text FROM documents),
adw AS MATERIALIZED (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs),
dwords AS MATERIALIZED (SELECT DISTINCT w FROM adw),
mt AS MATERIALIZED (SELECT d.w AS w, CAST(t.pos AS INT) AS pos, CAST(max(len(v.p)) AS INT) AS l
  FROM dwords d, unnest(range(1, length(d.w)+1)) AS t(pos), vocab v
  WHERE substr(d.w, CAST(t.pos AS INT), len(v.p)) = v.p GROUP BY 1, 2),
walk AS (
  SELECT w, 1 AS pos, 0 AS np, FALSE AS unk FROM dwords
  UNION ALL
  SELECT k.w,
    CASE WHEN m.l IS NULL THEN length(k.w) + 1 ELSE k.pos + m.l END,
    CASE WHEN m.l IS NULL THEN 1 ELSE k.np + 1 END,
    m.l IS NULL
  FROM walk k LEFT JOIN mt m ON m.w = k.w AND m.pos = k.pos
  WHERE k.pos <= length(k.w)),
res AS (SELECT w, np, unk FROM walk WHERE pos > length(w))
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(r.np) AS BIGINT) AS n_pieces,
  CAST(sum(CASE WHEN r.unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
FROM adw a JOIN res r ON a.w = r.w GROUP BY 1"""
  }

  // ---- unigram-LM tokenizer oracle (validated in tools/proto_unigram.py) --

  /** One Viterbi-dp candidate struct for piece length `lp` at 1-based
    * substr start `pos` of the dp-state row: lp=1 carries the UNK
    * fallback (count 0 for an out-of-vocabulary character), lp>=2 is a
    * candidate only when the substring is in the vocabulary map; an
    * out-of-range `nps[lp]` is NULL and the filter drops it. */
  private def uniDpCand(lp: Int): String = {
    val look = s"m[substr(w, pos, $lp)][1]"
    if (lp == 1)
      s"{'np': nps[1] + 1, 'negsc': -(coalesce($look, 0) + scs[1])}"
    else
      s"""{'np': CASE WHEN $look IS NOT NULL THEN nps[$lp] + 1 END,
         'negsc': -($look + scs[$lp])}"""
  }

  /** Backward Viterbi dp as a recursive CTE: each word's state row
    * carries the dp (np, sc) lists for positions already computed;
    * one position per iteration, best candidate by struct sort
    * (np asc, sc desc). `nps[1]` of the pos=0 row is the word's
    * optimal piece count. */
  private def uniDpCte(name: String, vm: String, maxLen: Int): String = {
    val cands = (1 to maxLen).map(uniDpCand).mkString(",\n        ")
    s"""$name AS (
  SELECT w, length(w) AS pos, [CAST(0 AS BIGINT)] AS nps, [CAST(0 AS BIGINT)] AS scs FROM wf
  UNION ALL
  SELECT w, pos - 1, list_prepend(b.np, nps), list_prepend(-b.negsc, scs)
  FROM (
    SELECT w, pos, nps, scs,
      (list_sort(list_filter([
        $cands
      ], x -> x.np IS NOT NULL)))[1] AS b
    FROM $name, $vm WHERE pos > 0
  )
)"""
  }

  /** Forward reconstruction as a second recursion over the dp table:
    * at each position take the candidate minimizing
    * (np, -sc, -len) — ties between optimal pieces go to the LONGEST,
    * which is unique (one piece per length matches at a position).
    * Emits each word's optimal piece sequence. */
  private def uniPathCte(name: String, dname: String, vm: String,
                         maxLen: Int): String = {
    val cands = (1 to maxLen).map { lp =>
      if (lp == 1)
        s"""{'np': a.nparr[q.pos+2] + 1,
         'negsc': -(coalesce(m[substr(q.w, q.pos+1, 1)][1], 0) + a.scarr[q.pos+2]),
         'neglp': -1, 'p': substr(q.w, q.pos+1, 1), 'lp': 1}"""
      else
        s"""{'np': CASE WHEN m[substr(q.w, q.pos+1, $lp)][1] IS NOT NULL THEN a.nparr[q.pos+${lp + 1}] + 1 END,
         'negsc': -(m[substr(q.w, q.pos+1, $lp)][1] + a.scarr[q.pos+${lp + 1}]),
         'neglp': -$lp, 'p': substr(q.w, q.pos+1, $lp), 'lp': $lp}"""
    }.mkString(",\n        ")
    s"""${dname}arr AS (SELECT w, list(nps[1] ORDER BY pos) AS nparr, list(scs[1] ORDER BY pos) AS scarr FROM $dname GROUP BY w),
$name AS (
  SELECT w, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM wf
  UNION ALL
  SELECT w, pos + b.lp, list_append(pieces, b.p)
  FROM (
    SELECT q.w, q.pos, q.pieces,
      (list_sort(list_filter([
        $cands
      ], x -> x.np IS NOT NULL)))[1] AS b
    FROM $name q JOIN ${dname}arr a USING (w), $vm WHERE q.pos < length(q.w)
  )
)"""
  }

  /** One E/M round: vocabulary map → dp → path → frequency-weighted
    * usage → prune (chars always survive with count max(usage, 1);
    * multi-char pieces keep the top `keep` by usage desc, piece asc). */
  private def uniRoundCtes(t: Int, prevV: String, keep: Int, maxLen: Int): String =
    s"""vm$t AS (SELECT map(list(p ORDER BY p), list(cnt ORDER BY p)) AS m FROM $prevV),
${uniDpCte(s"d$t", s"vm$t", maxLen)},
${uniPathCte(s"p$t", s"d$t", s"vm$t", maxLen)},
u$t AS MATERIALIZED (SELECT p, CAST(sum(wc) AS BIGINT) AS u FROM
  (SELECT f.wc, unnest(q.pieces) AS p FROM p$t q JOIN wf f USING (w) WHERE q.pos = length(q.w))
  GROUP BY p),
v$t AS MATERIALIZED (
  SELECT v.p, CAST(greatest(coalesce(u.u, 0), 1) AS BIGINT) AS cnt
  FROM $prevV v LEFT JOIN u$t u USING (p) WHERE length(v.p) = 1
  UNION ALL
  SELECT p, cnt FROM (
    SELECT v.p, CAST(coalesce(u.u, 0) AS BIGINT) AS cnt
    FROM $prevV v LEFT JOIN u$t u USING (p) WHERE length(v.p) >= 2
    ORDER BY cnt DESC, v.p LIMIT $keep))"""

  /** Shared head: augmented corpus → distinct words → alphabet +
    * substring seeds → v0. The WITH is RECURSIVE for the dp/path CTEs
    * downstream. */
  private def uniHead(seedN: Int, maxLen: Int): String =
    s"""WITH RECURSIVE $augDocsCte,
wds AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs),
wf AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wds GROUP BY w),
alpha AS MATERIALIZED (SELECT p, CAST(sum(wc) AS BIGINT) AS cnt FROM
  (SELECT wc, unnest(list_transform(range(1, length(w)+1), i -> substr(w, CAST(i AS INT), 1))) AS p FROM wf)
  GROUP BY p),
seeds AS MATERIALIZED (SELECT p, cnt FROM (
  SELECT p, CAST(sum(wc) AS BIGINT) AS cnt FROM (
    SELECT wc, unnest(flatten(list_transform(range(2, ${maxLen + 1}), l ->
      CASE WHEN length(w) >= l THEN list_transform(range(1, length(w) - CAST(l AS INT) + 2),
        st -> substr(w, CAST(st AS INT), CAST(l AS INT))) ELSE [] END))) AS p
    FROM wf) GROUP BY p
  ORDER BY cnt DESC, p LIMIT $seedN)),
v0 AS MATERIALIZED (SELECT p, cnt FROM alpha UNION ALL SELECT p, cnt FROM seeds)"""

  private def uniTrainChain(seedN: Int, maxLen: Int, keeps: Seq[Int]): String =
    (uniHead(seedN, maxLen) +:
      keeps.zipWithIndex.map { case (k, i) =>
        uniRoundCtes(i + 1, s"v$i", k, maxLen) }).mkString(",\n")

  private def uniTrainOracle(seedN: Int, maxLen: Int, keeps: Seq[Int]): String =
    s"""${uniTrainChain(seedN, maxLen, keeps)}
SELECT p AS piece, cnt FROM v${keeps.length} ORDER BY piece"""

  private def uniEncodeOracle(seedN: Int, maxLen: Int, keeps: Seq[Int]): String = {
    val last = keeps.length
    s"""${uniTrainChain(seedN, maxLen, keeps)},
vm${last + 1} AS (SELECT map(list(p ORDER BY p), list(cnt ORDER BY p)) AS m FROM v$last),
${uniDpCte(s"d${last + 1}", s"vm${last + 1}", maxLen)},
wnp AS MATERIALIZED (SELECT w, nps[1] AS np FROM d${last + 1} WHERE pos = 0),
docw AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(np) AS BIGINT) AS n_pieces
FROM docw JOIN wnp USING (w) GROUP BY doc_id"""
  }

  private def bpeTrainOracleCore(head: String, rounds: Int): String = {
    val sep = BpeSep
    val stages = (1 to rounds).map { r =>
      s""",
p$r AS (SELECT s.lhs AS lhs, s.rhs AS rhs, CAST(sum(wc) AS BIGINT) AS total FROM (
    SELECT wc, unnest(list_transform(range(1, len(syms)), j -> {'lhs': syms[j], 'rhs': syms[j+1]})) AS s
    FROM (SELECT wc, string_split(trim(vstr, $sep), $sep || $sep) AS syms FROM v$r))
  GROUP BY 1, 2),
b$r AS (SELECT lhs, rhs, total FROM p$r ORDER BY total DESC, lhs, rhs LIMIT 1),
v${r + 1} AS (SELECT replace(vstr, $sep || lhs || $sep || $sep || rhs || $sep,
    $sep || lhs || rhs || $sep) AS vstr, wc FROM v$r, b$r)"""
    }.mkString
    val rows = (1 to rounds)
      .map(r => s"SELECT CAST($r AS INT) AS round, lhs, rhs, lhs || rhs AS merged, total FROM b$r")
      .mkString("\nUNION ALL ")
    s"$head$stages\n$rows"
  }

  /** Oracle twin of [[TextAnalysis.bpeEncode]] over [[bpeTrainOracle]]'s
    * merge CTEs: every (doc, word occurrence) replays the b1..bR
    * replace chain, then piece counts roll up per document. */
  private def bpeEncodeOracle(rounds: Int): String = {
    val sep = "chr(31)"
    val train = bpeTrainOracle(rounds)
    // keep only the WITH-chain (drop the final merge-row SELECTs)
    val ctes = train.substring(0, train.lastIndexOf("\nSELECT CAST(1 AS INT)"))
    // scalar subqueries, not a cross join: if training exhausts before
    // round r (b$r empty), a cross join would empty every later stage
    // and the whole result — the CASE passes vstr through unchanged,
    // matching the engine loop that simply stops merging
    val encodeStages = (1 to rounds).map { r =>
      s""",
w$r AS (SELECT doc_id,
  CASE WHEN (SELECT count(*) FROM b$r) = 0 THEN vstr
       ELSE replace(vstr,
         (SELECT $sep || lhs || $sep || $sep || rhs || $sep FROM b$r),
         (SELECT $sep || lhs || rhs || $sep FROM b$r)) END AS vstr
  FROM w${r - 1})"""
    }.mkString
    s"""$ctes,
dw AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM documents),
w0 AS (SELECT doc_id, $sep || array_to_string(list_transform(range(1, length(w)+1),
    i -> substr(w, CAST(i AS INT), 1)), $sep || $sep) || $sep AS vstr FROM dw)$encodeStages
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(len(string_split(trim(vstr, $sep), $sep || $sep))) AS BIGINT) AS n_pieces
FROM w$rounds GROUP BY doc_id"""
  }

  /** Byte-level twin of [[bpeEncodeOracle]] over [[bpeByteHead]]'s
    * merge CTEs and the augmented corpus: each word occurrence carries
    * an `sp` flag — special tokens pass through the replay untouched
    * and count exactly one piece; everything else replays the byte-
    * symbol merge chain. */
  private def bpeByteEncodeOracle(rounds: Int): String = {
    val sep = BpeSep
    val train = bpeTrainOracleCore(bpeByteHead, rounds)
    val ctes = train.substring(0, train.lastIndexOf("\nSELECT CAST(1 AS INT)"))
    val encodeStages = (1 to rounds).map { r =>
      s""",
w$r AS (SELECT doc_id, sp,
  CASE WHEN sp OR (SELECT count(*) FROM b$r) = 0 THEN vstr
       ELSE replace(vstr,
         (SELECT $sep || lhs || $sep || $sep || rhs || $sep FROM b$r),
         (SELECT $sep || lhs || rhs || $sep FROM b$r)) END AS vstr
  FROM w${r - 1})"""
    }.mkString
    s"""$ctes,
dw AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM adocs),
w0 AS (SELECT doc_id, (w = '$BpeSpecial') AS sp,
  CASE WHEN w = '$BpeSpecial' THEN '' ELSE ${byteVstr("w")} END AS vstr FROM dw)$encodeStages
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(CASE WHEN sp THEN 1 ELSE 0 END) AS BIGINT) AS n_special,
  CAST(sum(CASE WHEN sp THEN 1
    ELSE len(string_split(trim(vstr, $sep), $sep || $sep)) END) AS BIGINT) AS n_pieces
FROM w$rounds GROUP BY doc_id"""
  }

  /** Shared oracle CTEs: normalized words and distinct 3-shingles. */
  /** The quote-augmentation both dedup_containment sides share: every
    * 40th document's first 12 tokens become a standalone "quote" doc
    * at doc_id + 1e6 (its 3-shingle set is a strict subset of the
    * source's, so containment is 1000 permille while Jaccard is low). */
  private def quoteAugDocs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 12)).as("text")))
  }

  private val quoteAugCte =
    """qdocs AS (SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
    array_to_string((regexp_split_to_array(lower(trim(text)), '\s+'))[1:12], ' ') AS text
  FROM documents WHERE doc_id % 40 = 0),
dwords AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM qdocs),
dsh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS sh FROM dwords WHERE len(ws) >= 3)"""

  private val shingleCte =
    """dwords AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
dsh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS sh FROM dwords WHERE len(ws) >= 3)"""

  /** 60-bit md5-derived hash — the oracle twin of Dedup.h60. */
  private def oh60(e: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed:' || $e), 1, 15)) AS BIGINT)"

  // universal-hash minima over the 32-bit base hash — constants shared
  // with Dedup.minhashSignatures (single source of truth)
  private val sigCols = Dedup.minhashParams(NumHashes).zipWithIndex
    .map { case ((a, b), i) =>
      s"  min(CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) * $a + $b) AS m${"%02d".format(i)}"
    }
    .mkString(",\n")
  private val sigCte =
    s"""WITH $shingleCte,
sigs AS (SELECT doc_id,\n$sigCols\nFROM dsh GROUP BY doc_id)"""

  /** Oracle twin of the banded signature explode in Dedup.lshCandidates. */
  private val bandSelects = (0 until Bands).map { b =>
    val cols = (0 until RowsPerBand)
      .map(r => s"CAST(m${"%02d".format(b * RowsPerBand + r)} AS VARCHAR)")
    s"SELECT doc_id, $b AS band_id, md5(concat_ws(',', ${cols.mkString(", ")})) AS sig FROM sigs"
  }.mkString(" UNION ALL ")

  /** Oracle twin of the LSH-verified pair + connected-component chain:
    * candidates → exact-Jaccard `pairs` → symmetric `cedges` → recursive
    * min-id reachability (`reach`) → `clus(doc_id, cluster_id)`. The
    * recursive CTE's UNION-distinct is DuckDB's fixpoint; min over all
    * reachable seeds equals the component's minimum id — the same
    * canonical label the Spark min-label propagation converges to. */
  private[graft] val clusterCte =
    s"""bandsigs AS ($bandSelects),
cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsigs a JOIN bandsigs b
    ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id),
csets AS (SELECT doc_id,
    list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
  FROM dwords WHERE len(ws) >= 3),
pairs AS (SELECT id_a, id_b FROM cands
  JOIN csets sa ON id_a = sa.doc_id JOIN csets sb ON id_b = sb.doc_id
  WHERE 3 * len(list_intersect(sa.shs, sb.shs)) >= 1 * (len(sa.shs) + len(sb.shs))),
cedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (SELECT src AS id, src AS r FROM cedges
  UNION
  SELECT e.dst, r.r FROM reach r JOIN cedges e ON e.src = r.id),
clus AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)"""

  private[graft] val recursiveSigCte = sigCte.replaceFirst("WITH ", "WITH RECURSIVE ")

  val oracle: Map[String, String] = oracleBase +
    // the bloom-prefiltered incremental path is value-identical by
    // construction (a bloom miss cannot match; positives are exactly
    // re-verified), so it shares dedup_incremental's oracle
    ("dedup_incremental_bloom" -> oracleBase("dedup_incremental"))

  private lazy val oracleBase: Map[String, String] = Map(
    "text_nfc" ->
      s"""SELECT doc_id,
  CAST(length(text || ' $NfcMarker') AS BIGINT) AS raw_chars,
  nfc_normalize(text || ' $NfcMarker') AS nfc,
  CAST(length(nfc_normalize(text || ' $NfcMarker')) AS BIGINT) AS nfc_chars
FROM documents""",

    "dedup_clusters" ->
      s"""$recursiveSigCte,
$clusterCte
SELECT doc_id, cluster_id FROM clus""",

    "dedup_keepers" ->
      s"""$recursiveSigCte,
$clusterCte
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM clus c
  WHERE c.doc_id = d.doc_id AND c.doc_id <> c.cluster_id)""",

    "text_stats" ->
      """SELECT doc_id,
  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) AS n_distinct,
  CAST(length(lower(trim(text))) AS BIGINT) AS n_chars_norm,
  CAST(len(regexp_extract_all(lower(trim(text)), '[^a-z0-9\s]')) AS BIGINT) AS n_punct,
  CAST((length(lower(trim(text))) + 3) // 4 AS BIGINT) AS bpe_est,
  CAST((CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) * 1000) // len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS quality_e3
FROM documents""",

    // Cavnar–Trenkle out-of-place distance against the same literal
    // rank profiles the engine bakes into its plan (generated from one
    // shared Scala source — rank LITERALS, no cross-engine profile
    // sort)
    "lang_id" -> langIdOracle,

    "fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents""",

    // gram hash mirrors Dedup.spanDedup exactly: one md5 per TOKEN, then
    // Dedup.spanGramHash's polynomial per position (same expression
    // string — both dialects agree on % * + and bracket indexing; only
    // the range base differs, 1-based here vs 0-based in Spark)
    "span_dedup" ->
      s"""WITH dw AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents
  WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 1),
th AS (SELECT doc_id, ws,
    list_transform(ws, t -> CAST(('0x' || substr(md5('sp:' || t), 1, 15)) AS BIGINT)) AS hs
  FROM dw),
g AS (SELECT doc_id, ws,
    CASE WHEN len(ws) >= $SpanK THEN list_transform(range(1, len(ws)-${SpanK - 2}),
      i -> ${Dedup.spanGramHash(SpanK)})
    ELSE CAST([] AS BIGINT[]) END AS ghs
  FROM th),
occ AS (SELECT DISTINCT doc_id, unnest(ghs) AS gh FROM g),
dup AS (SELECT gh, min(doc_id) AS keeper FROM occ GROUP BY gh HAVING count(*) >= 2),
pos AS (SELECT doc_id, pg.i AS i, pg.gh AS gh FROM (
  SELECT doc_id, unnest(list_transform(range(1, len(ghs)+1),
    i -> {'i': i, 'gh': ghs[i]})) AS pg FROM g)),
ds AS (SELECT p.doc_id, list_sort(list(p.i)) AS ss
  FROM pos p JOIN dup d ON p.gh = d.gh AND p.doc_id <> d.keeper
  GROUP BY p.doc_id),
j AS (SELECT g.doc_id, g.ws, coalesce(ds.ss, CAST([] AS BIGINT[])) AS ss
  FROM g LEFT JOIN ds USING (doc_id)),
kept AS (SELECT doc_id, ws,
    list_transform(list_filter(range(1, len(ws)+1),
      p -> len(list_filter(ss, s -> s <= p AND s >= p - ${SpanK - 1})) = 0), p -> ws[p]) AS kt
  FROM j)
SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
  CAST(len(kt) AS BIGINT) AS n_kept,
  coalesce(array_to_string(kt, ' '), '') AS cleaned
FROM kept""",

    // winnow-prefiltered approximate variant: fingerprints are window
    // minima (w=4) over the SAME polynomial gram hashes span_dedup
    // uses; candidate docs share a duplicated fingerprint (df >= 2) or
    // an exact-duplicated text; the span_dedup chain — including the
    // dup inventory — runs over candidates only, everyone else passes
    // through with n_kept = n_tokens. Exact for duplicated spans
    // >= k+w-1 tokens by the winnowing guarantee.
    "span_dedup_winnow" ->
      s"""WITH dw AS (SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents
  WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 1),
th AS (SELECT doc_id, text, ws,
    list_transform(ws, t -> CAST(('0x' || substr(md5('sp:' || t), 1, 15)) AS BIGINT)) AS hs
  FROM dw),
g AS (SELECT doc_id, text, ws,
    CASE WHEN len(ws) >= $SpanK THEN list_transform(range(1, len(ws)-${SpanK - 2}),
      i -> ${Dedup.spanGramHash(SpanK)})
    ELSE CAST([] AS BIGINT[]) END AS ghs
  FROM th),
f AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ghs)-2),
    j -> list_min(ghs[j:j+3])))) AS fp
  FROM g WHERE len(ghs) >= 4),
dupf AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2),
cand AS (SELECT DISTINCT doc_id FROM f JOIN dupf USING (fp)
  UNION
  SELECT doc_id FROM g WHERE text IN (
    SELECT text FROM documents GROUP BY text HAVING count(*) >= 2)),
gc AS (SELECT doc_id, ws, ghs FROM g WHERE doc_id IN (SELECT doc_id FROM cand)),
occ AS (SELECT DISTINCT doc_id, unnest(ghs) AS gh FROM gc),
dup AS (SELECT gh, min(doc_id) AS keeper FROM occ GROUP BY gh HAVING count(*) >= 2),
pos AS (SELECT doc_id, pg.i AS i, pg.gh AS gh FROM (
  SELECT doc_id, unnest(list_transform(range(1, len(ghs)+1),
    i -> {'i': i, 'gh': ghs[i]})) AS pg FROM gc)),
ds AS (SELECT p.doc_id, list_sort(list(p.i)) AS ss
  FROM pos p JOIN dup d ON p.gh = d.gh AND p.doc_id <> d.keeper
  GROUP BY p.doc_id),
j AS (SELECT gc.doc_id, gc.ws, coalesce(ds.ss, CAST([] AS BIGINT[])) AS ss
  FROM gc LEFT JOIN ds USING (doc_id)),
kept AS (SELECT doc_id, ws,
    list_transform(list_filter(range(1, len(ws)+1),
      p -> len(list_filter(ss, s -> s <= p AND s >= p - ${SpanK - 1})) = 0), p -> ws[p]) AS kt
  FROM j)
SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
  CAST(len(kt) AS BIGINT) AS n_kept,
  coalesce(array_to_string(kt, ' '), '') AS cleaned
FROM kept
UNION ALL
SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
  CAST(len(ws) AS BIGINT) AS n_kept,
  array_to_string(ws, ' ') AS cleaned
FROM g
WHERE doc_id NOT IN (SELECT doc_id FROM cand)""",

    // char-gram twin: same dup/keeper/coverage chain as span_dedup, over
    // ascii codes of the [a-z0-9]-only stream (no digest — the
    // polynomial runs on the codes; substr is per-position here, fine
    // at oracle scale)
    "span_dedup_chars" -> spanCharsExactOracle("documents"),

    // the sparse fixture: approximate == exact there (duplicates are
    // exact copies ≥ k+w-1 chars; uniques share no 20-char window), so
    // BOTH sparse twins replay the one exact oracle over the fixture
    "span_dedup_chars_sparse" -> spanCharsExactOracle(sparseDocsSql),
    "span_dedup_chars_winnow_sparse" -> spanCharsExactOracle(sparseDocsSql),

    // char twin of span_dedup_winnow: fingerprints are window minima
    // (w=4) over the char-gram hashes; candidates share a duplicated
    // fingerprint or a duplicated cleaned text; the chain runs over
    // candidates only, everyone else reports zero coverage. The gate
    // runs the production default maxCandidateFrac=0.5, and the sf0.01
    // fixture's ~42% candidacy stays under it — so the PURE approximate
    // path this SQL models is the path the engine takes at oracle scale
    // (the >0.5 bail-out at larger scale returns exact results, pinned
    // by the DedupSpec equivalence test, not this oracle)
    "span_dedup_chars_winnow" ->
      s"""WITH c AS (SELECT doc_id, regexp_replace(lower(trim(text)), '[^a-z0-9]', '', 'g') AS clean
  FROM documents),
h AS (SELECT doc_id, clean, length(clean) AS n,
    list_transform(range(1, length(clean)+1), i -> CAST(ascii(substr(clean, CAST(i AS INT), 1)) AS BIGINT)) AS hs
  FROM c WHERE length(clean) >= 1),
g AS (SELECT doc_id, clean, n,
    CASE WHEN n >= $SpanCharsK THEN list_transform(range(1, n-${SpanCharsK - 2}),
      i -> ${Dedup.spanGramHash(SpanCharsK)})
    ELSE CAST([] AS BIGINT[]) END AS ghs
  FROM h),
f AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ghs)-2),
    j -> list_min(ghs[j:j+3])))) AS fp
  FROM g WHERE len(ghs) >= 4),
dupf AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2),
cand AS (SELECT DISTINCT doc_id FROM f JOIN dupf USING (fp)
  UNION
  SELECT doc_id FROM g WHERE clean IN (
    SELECT clean FROM c GROUP BY clean HAVING count(*) >= 2)),
gc AS (SELECT doc_id, n, ghs FROM g WHERE doc_id IN (SELECT doc_id FROM cand)),
occ AS (SELECT DISTINCT doc_id, unnest(ghs) AS gh FROM gc),
dup AS (SELECT gh, min(doc_id) AS keeper FROM occ GROUP BY gh HAVING count(*) >= 2),
pos AS (SELECT doc_id, pg.i AS i, pg.gh AS gh FROM (
  SELECT doc_id, unnest(list_transform(range(1, len(ghs)+1),
    i -> {'i': i, 'gh': ghs[i]})) AS pg FROM gc)),
ds AS (SELECT p.doc_id, list_sort(list(p.i)) AS ss
  FROM pos p JOIN dup d ON p.gh = d.gh AND p.doc_id <> d.keeper
  GROUP BY p.doc_id),
j AS (SELECT gc.doc_id, gc.n, coalesce(ds.ss, CAST([] AS BIGINT[])) AS ss
  FROM gc LEFT JOIN ds USING (doc_id))
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
  CAST(len(list_filter(range(1, n+1),
    p -> len(list_filter(ss, s -> s <= p AND s >= p - ${SpanCharsK - 1})) > 0)) AS BIGINT) AS n_dup_chars
FROM j
UNION ALL
SELECT doc_id, CAST(n AS BIGINT) AS n_chars, CAST(0 AS BIGINT) AS n_dup_chars
FROM g WHERE doc_id NOT IN (SELECT doc_id FROM cand)""",

    "lm_score" ->
      """WITH dw AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1])) AS b
  FROM dw WHERE len(ws) >= 2),
c2 AS (SELECT b, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY b),
c1 AS (SELECT split_part(b, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
p AS (SELECT b, (c2 * 1000000) // c1 AS prob_e6
  FROM c2 JOIN c1 ON split_part(b, ' ', 1) = w1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
  CAST(sum(prob_e6) // count(*) AS BIGINT) AS lm_score_e6
FROM bg JOIN p USING (b)
GROUP BY doc_id""",

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)""",

    "dedup_near_pairs" ->
      s"""WITH $shingleCte,
cnt AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
keep AS (SELECT sh FROM dsh GROUP BY sh HAVING count(*) BETWEEN 2 AND $MaxShingleDf),
dshc AS (SELECT d.doc_id, d.sh FROM dsh d JOIN keep USING (sh)),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM dshc a JOIN dshc b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, inter, ca.n AS na, cb.n AS nb
FROM inter
JOIN cnt ca ON id_a = ca.doc_id
JOIN cnt cb ON id_b = cb.doc_id
WHERE 3 * inter >= 1 * (ca.n + cb.n)""",

    // same shared-shingle skeleton over the quote-augmented corpus,
    // containment predicate on the smaller side + permille evidence
    "dedup_containment" ->
      s"""WITH $quoteAugCte,
cnt AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
keep AS (SELECT sh FROM dsh GROUP BY sh HAVING count(*) BETWEEN 2 AND $MaxShingleDf),
dshc AS (SELECT d.doc_id, d.sh FROM dsh d JOIN keep USING (sh)),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM dshc a JOIN dshc b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, inter, ca.n AS na, cb.n AS nb,
  (inter * 1000) // ca.n AS cont_a_permille,
  (inter * 1000) // cb.n AS cont_b_permille
FROM inter
JOIN cnt ca ON id_a = ca.doc_id
JOIN cnt cb ON id_b = cb.doc_id
WHERE 10 * inter >= 9 * least(ca.n, cb.n)""",

    "chunk_docs" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
c AS (SELECT doc_id, unnest(list_transform(range(0, len(ws), 40),
        s -> {'idx': s // 40, 'toks': ws[s+1:s+50]})) AS ch
      FROM w WHERE len(ws) >= 1)
SELECT doc_id, CAST(ch.idx AS INT) AS chunk_idx,
  array_to_string(ch.toks, ' ') AS chunk_text,
  CAST(len(ch.toks) AS BIGINT) AS n_tokens
FROM c""",

    "pipeline_corpus" ->
      s"""$sigCte,
bandsigs AS ($bandSelects),
cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsigs a JOIN bandsigs b
    ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id,
    list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
  FROM dwords WHERE len(ws) >= 3),
losers AS (SELECT DISTINCT id_b AS doc_id FROM cands
  JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
  WHERE 3 * len(list_intersect(sa.shs, sb.shs)) >= 1 * (len(sa.shs) + len(sb.shs))),
q AS (SELECT doc_id, CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
    (CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS BIGINT) * 1000)
      // len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS quality_e3
  FROM documents)
SELECT doc_id, n_tokens FROM q
WHERE n_tokens >= 30 AND quality_e3 >= 500
  AND NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = q.doc_id)""",

    "minhash_signatures" -> s"$sigCte SELECT * FROM sigs",

    "dedup_keepers_best" ->
      s"""$recursiveSigCte,
$clusterCte,
qsc AS (SELECT doc_id,
    (CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS BIGINT) * 1000)
      // len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS score
  FROM documents),
win AS (SELECT doc_id FROM (
    SELECT c.doc_id,
      row_number() OVER (PARTITION BY c.cluster_id ORDER BY q.score DESC, c.doc_id) AS rn
    FROM clus c JOIN qsc q USING (doc_id)) WHERE rn = 1)
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM clus WHERE clus.doc_id = d.doc_id)
   OR EXISTS (SELECT 1 FROM win WHERE win.doc_id = d.doc_id)""",

    "dedup_incremental" ->
      s"""$sigCte,
bandsigs AS ($bandSelects),
xcands AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_prior
  FROM bandsigs a JOIN bandsigs b ON a.band_id = b.band_id AND a.sig = b.sig
  WHERE a.doc_id % 4 = 3 AND b.doc_id % 4 < 3),
xsets AS (SELECT doc_id,
    list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
  FROM dwords WHERE len(ws) >= 3),
xlosers AS (SELECT DISTINCT id_new AS doc_id FROM xcands
  JOIN xsets sa ON id_new = sa.doc_id JOIN xsets sb ON id_prior = sb.doc_id
  WHERE 3 * len(list_intersect(sa.shs, sb.shs)) >= 1 * (len(sa.shs) + len(sb.shs))),
ph AS (SELECT DISTINCT md5(text) AS th FROM documents WHERE doc_id % 4 < 3)
SELECT d.doc_id FROM documents d
WHERE d.doc_id % 4 = 3
  AND NOT EXISTS (SELECT 1 FROM ph WHERE ph.th = md5(d.text))
  AND NOT EXISTS (SELECT 1 FROM xlosers l WHERE l.doc_id = d.doc_id)""",

    // nightly composition oracle: the intra-batch recursive cluster
    // chain restricted to the new quarter, plus the cross-corpus
    // exact/near losers of dedup_incremental — survivors pass both
    "pipeline_nightly" ->
      s"""$recursiveSigCte,
bandsigs AS ($bandSelects),
csets AS (SELECT doc_id,
    list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
  FROM dwords WHERE len(ws) >= 3),
ncands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsigs a JOIN bandsigs b
    ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id
  WHERE a.doc_id % 4 = 3 AND b.doc_id % 4 = 3),
npairs AS (SELECT id_a, id_b FROM ncands
  JOIN csets sa ON id_a = sa.doc_id JOIN csets sb ON id_b = sb.doc_id
  WHERE 3 * len(list_intersect(sa.shs, sb.shs)) >= 1 * (len(sa.shs) + len(sb.shs))),
ncedges AS (SELECT id_a AS src, id_b AS dst FROM npairs
  UNION ALL SELECT id_b, id_a FROM npairs),
nreach AS (SELECT src AS id, src AS r FROM ncedges
  UNION
  SELECT e.dst, r.r FROM nreach r JOIN ncedges e ON e.src = r.id),
nclus AS (SELECT id AS doc_id, min(r) AS cluster_id FROM nreach GROUP BY id),
xcands AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_prior
  FROM bandsigs a JOIN bandsigs b ON a.band_id = b.band_id AND a.sig = b.sig
  WHERE a.doc_id % 4 = 3 AND b.doc_id % 4 < 3),
xlosers AS (SELECT DISTINCT id_new AS doc_id FROM xcands
  JOIN csets sa ON id_new = sa.doc_id JOIN csets sb ON id_prior = sb.doc_id
  WHERE 3 * len(list_intersect(sa.shs, sb.shs)) >= 1 * (len(sa.shs) + len(sb.shs))),
ph AS (SELECT DISTINCT md5(text) AS th FROM documents WHERE doc_id % 4 < 3)
SELECT d.doc_id FROM documents d
WHERE d.doc_id % 4 = 3
  AND NOT EXISTS (SELECT 1 FROM nclus c
    WHERE c.doc_id = d.doc_id AND c.doc_id <> c.cluster_id)
  AND NOT EXISTS (SELECT 1 FROM ph WHERE ph.th = md5(d.text))
  AND NOT EXISTS (SELECT 1 FROM xlosers l WHERE l.doc_id = d.doc_id)""",

    "lsh_candidates" ->
      s"""$sigCte,
bandsigs AS ($bandSelects)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bandsigs a JOIN bandsigs b
  ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id""",

    // exact truth and LSH candidates replayed from their own gated
    // CTEs, folded to the three counts + floor-permille recall
    "lsh_recall" ->
      s"""$sigCte,
bandsigs AS ($bandSelects),
cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsigs a JOIN bandsigs b
    ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id),
cnt AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
keep AS (SELECT sh FROM dsh GROUP BY sh HAVING count(*) BETWEEN 2 AND $MaxShingleDf),
dshc AS (SELECT d.doc_id, d.sh FROM dsh d JOIN keep USING (sh)),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM dshc a JOIN dshc b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS MATERIALIZED (SELECT id_a, id_b FROM inter
  JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
  WHERE 3 * inter >= 1 * (ca.n + cb.n)),
tc AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
cc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
hc AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
  FROM truth JOIN cand USING (id_a, id_b))
SELECT n_true, n_cand, n_hit,
  CAST(CASE WHEN n_true = 0 THEN 1000 ELSE (n_hit * 1000) // n_true END AS BIGINT)
    AS recall_permille
FROM tc, cc, hc""",

    "tfidf_topk" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
p0 AS (SELECT doc_id, unnest(list_distinct(ws)) AS term, ws FROM w),
p AS (SELECT doc_id, term, CAST(len(list_filter(ws, x -> x = term)) AS BIGINT) AS tf FROM p0),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term),
sc AS (SELECT p.doc_id, p.term, p.tf, d.df,
    CAST((p.tf * 1000000) // d.df AS BIGINT) AS score_e6
  FROM p JOIN dfreq d USING (term)),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, term) AS rn FROM sc)
SELECT doc_id, term, tf, df, score_e6, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= 5""",

    "bm25_topk" -> {
      import TextAnalysis.{Bm25K1E4 => K1, Bm25K1p1E4 => K1P1, Bm25BE4 => B}
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents),
d AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) // count(*) AS BIGINT) AS avgdl FROM d),
p0 AS (SELECT doc_id, dl, unnest(list_distinct(ws)) AS term, ws FROM d),
p AS (SELECT doc_id, dl, term, CAST(len(list_filter(ws, x -> x = term)) AS BIGINT) AS tf FROM p0),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term),
sc AS (SELECT p.doc_id, p.term, p.tf, d.df,
    CAST((length(bin(st.n_docs // d.df)) - 1) *
      ((p.tf * $K1P1 * 1000000) //
       (p.tf * 10000 + ($K1 * ((10000 - $B) + ($B * p.dl) // st.avgdl)) // 10000)) AS BIGINT) AS score_e6
  FROM p JOIN dfreq d USING (term), st),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, term) AS rn FROM sc)
SELECT doc_id, term, tf, df, score_e6, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= 5"""
    },

    "bm25_doc_topk" -> bm25DocOracleSql,

    // the one-shot retrieval aggregate, cross-joined with the two
    // phases: the engine's direct and store-served runs must BOTH
    // equal it — materialization is result-invisible or the hash breaks
    "postings_equiv" ->
      s"""WITH phases(phase) AS (VALUES ('direct'), ('served')),
base AS MATERIALIZED ($bm25DocOracleSql),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum(score_e6), 0) AS BIGINT) AS score_sum,
  CAST(coalesce(sum(doc_id * rank), 0) AS BIGINT) AS dr_sum,
  CAST(coalesce(sum(n_terms), 0) AS BIGINT) AS terms_sum FROM base)
SELECT phase, n_rows, score_sum, dr_sum, terms_sum FROM phases, a""",

    // takedown replay: the pre phase equals the full-corpus one-shot,
    // the deleted AND compacted phases both equal the filtered-corpus
    // one-shot — logical delete and physical fold are result-identical
    "postings_delete_equiv" ->
      s"""WITH full_base AS MATERIALIZED (${bm25DocOracleSqlOver("TRUE")}),
del_base AS MATERIALIZED (${bm25DocOracleSqlOver("doc_id % 5 <> 0")}),
fa AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum(score_e6), 0) AS BIGINT) AS score_sum,
  CAST(coalesce(sum(doc_id * rank), 0) AS BIGINT) AS dr_sum,
  CAST(coalesce(sum(n_terms), 0) AS BIGINT) AS terms_sum FROM full_base),
da AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum(score_e6), 0) AS BIGINT) AS score_sum,
  CAST(coalesce(sum(doc_id * rank), 0) AS BIGINT) AS dr_sum,
  CAST(coalesce(sum(n_terms), 0) AS BIGINT) AS terms_sum FROM del_base)
SELECT 'pre' AS phase, * FROM fa
UNION ALL SELECT 'deleted' AS phase, * FROM da
UNION ALL SELECT 'compacted' AS phase, * FROM da""",

    // four as-of phases, each the one-shot aggregate over exactly the
    // corpus the bound selects: batch 1 only / both batches / both
    // minus the op-3 takedown / the live view (== the last bound)
    "postings_asof" ->
      s"""WITH even_base AS MATERIALIZED (${bm25DocOracleSqlOver("doc_id % 2 = 0")}),
full_base AS MATERIALIZED (${bm25DocOracleSqlOver("TRUE")}),
del_base AS MATERIALIZED (${bm25DocOracleSqlOver("doc_id % 5 <> 0")}),
ea AS (${retrievalAggSql("even_base")}),
fa AS (${retrievalAggSql("full_base")}),
da AS (${retrievalAggSql("del_base")})
SELECT 'asof1' AS phase, * FROM ea
UNION ALL SELECT 'asof2' AS phase, * FROM fa
UNION ALL SELECT 'asof3' AS phase, * FROM da
UNION ALL SELECT 'live' AS phase, * FROM da""",

    // compact-then-append: base+batch before and after the fold replay
    // the two-thirds corpus; the post-fold append reaches the full one
    "postings_compact_append" ->
      s"""WITH part_base AS MATERIALIZED (${bm25DocOracleSqlOver("doc_id % 3 <> 2")}),
full_base AS MATERIALIZED (${bm25DocOracleSqlOver("TRUE")}),
pa AS (${retrievalAggSql("part_base")}),
fa AS (${retrievalAggSql("full_base")})
SELECT 'mixed1' AS phase, * FROM pa
UNION ALL SELECT 'folded' AS phase, * FROM pa
UNION ALL SELECT 'mixed2' AS phase, * FROM fa""",

    // the full / takedown-filtered / UPDATED-corpus replays: after the
    // re-add, scoring runs over the corpus with the %10 docs' new text
    // (two fresh terms appended), and the fold changes nothing
    "postings_reindex" ->
      s"""WITH full_base AS MATERIALIZED (${bm25DocOracleSqlOver("TRUE")}),
del_base AS MATERIALIZED (${bm25DocOracleSqlOver("doc_id % 10 <> 0")}),
upd_base AS MATERIALIZED (${bm25DocOracleSqlOver("TRUE", "TRUE",
        "CASE WHEN doc_id % 10 = 0 THEN text || ' updza updzb' ELSE text END")}),
fa AS (${retrievalAggSql("full_base")}),
da AS (${retrievalAggSql("del_base")}),
ua AS (${retrievalAggSql("upd_base")})
SELECT 'pre' AS phase, * FROM fa
UNION ALL SELECT 'deleted' AS phase, * FROM da
UNION ALL SELECT 'reindexed' AS phase, * FROM ua
UNION ALL SELECT 'folded' AS phase, * FROM ua""",

    // term-filtered replay: the purged terms vanish from the posting
    // side (df, sc, n_terms) while corpus stats stay the full ones —
    // marker read and physical fold both collapse to it
    "postings_term_purge" ->
      s"""WITH full_base AS MATERIALIZED (${bm25DocOracleSqlOver("TRUE")}),
purged_base AS MATERIALIZED (${bm25DocOracleSqlOver("TRUE", "term NOT IN ('ta7', 'tb3')")}),
fa AS (${retrievalAggSql("full_base")}),
pa AS (${retrievalAggSql("purged_base")})
SELECT 'pre' AS phase, * FROM fa
UNION ALL SELECT 'purged' AS phase, * FROM pa
UNION ALL SELECT 'folded' AS phase, * FROM pa""",

    "token_pieces" ->
      """SELECT doc_id,
  CAST(len(regexp_extract_all(lower(trim(text)), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')) AS BIGINT) AS n_pieces,
  CAST(len(list_distinct(regexp_extract_all(lower(trim(text)), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+'))) AS BIGINT) AS n_distinct_pieces
FROM documents""",

    // k=5 word grams, windows of 4 gram hashes, min per window,
    // distinct — DuckDB's 1-based inclusive list slice gs[j:j+3] is the
    // 4-wide window; hash = the shared 60-bit md5 derivation, 'wn:' salt
    "winnow_fp" ->
      """WITH dwords AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
g AS (SELECT doc_id, ws FROM dwords WHERE len(ws) >= 8),
gh AS (SELECT doc_id, list_transform(range(1, len(ws)-3), i ->
    CAST(('0x' || substr(md5('wn:' || ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]), 1, 15)) AS BIGINT)) AS gs
  FROM g)
SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(gs)-2),
  j -> list_min(gs[j:j+3])))) AS fp
FROM gh""",

    "winnow_pairs" ->
      s"""WITH dwords AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents),
g AS (SELECT doc_id, ws FROM dwords WHERE len(ws) >= 8),
gh AS (SELECT doc_id, list_transform(range(1, len(ws)-3), i ->
    CAST(('0x' || substr(md5('wn:' || ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]), 1, 15)) AS BIGINT)) AS gs
  FROM g),
f AS (SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(range(1, len(gs)-2),
    j -> list_min(gs[j:j+3])))) AS fp
  FROM gh),
keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) BETWEEN 2 AND $MaxShingleDf),
fk AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3""",

    "segment_shared" ->
      s"""$segmentCte
SELECT seg, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, min(doc_id) AS keeper_doc
FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2""",

    "segment_dedup" ->
      s"""$segmentCte,
st AS (SELECT seg, count(DISTINCT doc_id) AS df, min(doc_id) AS keeper_doc
  FROM segs GROUP BY seg),
j AS (SELECT s.doc_id, s.seg_idx, s.seg,
    (st.df < 2 OR s.doc_id = st.keeper_doc) AS survive
  FROM segs s JOIN st USING (seg))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
  CAST(sum(CASE WHEN survive THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE survive), '') AS cleaned
FROM j GROUP BY doc_id""",

    "word_freq" ->
      """WITH w AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word FROM documents)
SELECT word, count(*) AS cnt FROM w GROUP BY word
ORDER BY cnt DESC, word LIMIT 20""",

    // both engines run 1-based substr over the distinct-word table, so
    // the pair expression is dialect-shared verbatim
    "bpe_merges" ->
      """WITH wds AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w FROM documents),
wf AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM wds GROUP BY w),
pr AS (SELECT wc, unnest(list_transform(range(1, length(w)),
    i -> substr(w, CAST(i AS INT), 1) || substr(w, CAST(i AS INT)+1, 1))) AS pair
  FROM wf WHERE length(w) >= 2)
SELECT pair, CAST(sum(wc) AS BIGINT) AS total FROM pr GROUP BY pair
ORDER BY total DESC, pair LIMIT 20""",

    // full BPE training, one unrolled CTE stage per round. Symbol
    // sequences ride as chr(31)-wrapped strings (each symbol enclosed
    // in unit separators, absent from the ASCII corpus), so the greedy
    // left-to-right merge IS string replace: the pattern
    // sep+lhs+sep+sep+rhs+sep only aligns at symbol boundaries, and
    // replace() scans left-to-right non-overlapping — the textbook BPE
    // walk the engine's fold implements on arrays.
    "bpe_train" -> bpeTrainOracle(BpeRounds),

    "wordpiece_train" -> wordpieceTrainOracle(BpeRounds),
    "wordpiece_encode" -> wordpieceEncodeOracle(BpeRounds),

    // tokenizer application: the SAME unrolled training stages derive
    // b1..bR, then every (doc, word) replays the replace chain and the
    // per-doc piece counts roll up
    "bpe_encode" -> bpeEncodeOracle(BpeRounds),

    // byte-level training on the mixed-script augmented corpus: same
    // unrolled stage chain, byte-symbol v1, special token excluded
    "bpe_train_bytes" -> bpeTrainOracleCore(bpeByteHead, BpeRounds),

    // byte-fallback encoding: special tokens one piece each, everything
    // else replays the byte merge chain — nothing can drop
    "bpe_encode_bytes" -> bpeByteEncodeOracle(BpeRounds),

    // unigram-LM training replayed as recursive-CTE Viterbi dp + path
    // per E/M round (validated against an independent python reference
    // in tools/proto_unigram.py before wiring)
    "unigram_train" -> uniTrainOracle(UniSeedN, UniMaxLen, UniKeep),

    // encode: the same chain to the final vocabulary, one more dp, and
    // the per-doc rollup of optimal piece counts
    "unigram_encode" -> uniEncodeOracle(UniSeedN, UniMaxLen, UniKeep),

    "split_leakage" ->
      s"""$sigCte,
bandsigs AS ($bandSelects),
cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsigs a JOIN bandsigs b
    ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id),
csets AS (SELECT doc_id,
    list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
  FROM dwords WHERE len(ws) >= 3),
prs AS (SELECT id_a, id_b FROM cands
  JOIN csets sa ON id_a = sa.doc_id JOIN csets sb ON id_b = sb.doc_id
  WHERE 3 * len(list_intersect(sa.shs, sb.shs)) >= 1 * (len(sa.shs) + len(sb.shs))),
spl AS (SELECT doc_id,
    CASE WHEN CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 9
         THEN 'train' ELSE 'val' END AS split
  FROM documents)
SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
FROM prs p JOIN spl sa ON p.id_a = sa.doc_id JOIN spl sb ON p.id_b = sb.doc_id
WHERE sa.split <> sb.split""",

    "gopher_quality" -> {
      val stopList = TextAnalysis.GopherStopWords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents),
sg AS (SELECT doc_id, ws,
    list_transform(range(0, (len(ws) + ${SegLen - 1}) // $SegLen),
      i -> array_to_string(ws[i*$SegLen+1 : i*$SegLen+$SegLen], ' ')) AS segs
  FROM w WHERE len(ws) >= 1),
g AS (SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST((CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) * 1000) // len(ws) AS BIGINT) AS mean_wordlen_e3,
    CAST((CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) * 1000) // len(ws) AS BIGINT) AS alpha_e3,
    CAST((CAST(len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...'))) AS BIGINT) * 1000) // len(ws) AS BIGINT) AS symbol_e3,
    CAST(len(list_filter(ws, x -> list_contains($stopList, x))) AS BIGINT) AS n_stopwords,
    CAST((CAST(len(segs) - len(list_distinct(segs)) AS BIGINT) * 1000) // len(segs) AS BIGINT) AS dupline_e3,
    CAST((CAST(len(list_filter(segs, s -> starts_with(s, '-') OR starts_with(s, '*') OR starts_with(s, '•'))) AS BIGINT) * 1000) // len(segs) AS BIGINT) AS bullet_e3,
    CAST((CAST(len(list_filter(segs, s -> ends_with(s, '...'))) AS BIGINT) * 1000) // len(segs) AS BIGINT) AS ellipsis_e3
  FROM sg)
SELECT doc_id, n_words, mean_wordlen_e3, alpha_e3, symbol_e3, n_stopwords,
  dupline_e3, bullet_e3, ellipsis_e3,
  CASE WHEN n_words BETWEEN 50 AND 100000 AND mean_wordlen_e3 BETWEEN 3000 AND 10000
        AND alpha_e3 >= 800 AND symbol_e3 <= 100 AND n_stopwords >= 2
        AND dupline_e3 <= 300 AND bullet_e3 <= 900 AND ellipsis_e3 <= 300
       THEN 1 ELSE 0 END AS pass
FROM g"""
    },

    "quality_filter" ->
      """SELECT doc_id FROM (
  SELECT doc_id,
    len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens,
    (CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT) * 1000)
      // len(regexp_split_to_array(lower(trim(text)), '\s+')) AS quality_e3
  FROM documents)
WHERE n_tokens >= 30 AND quality_e3 >= 500""",

    "simhash" -> s"$simhashCte SELECT doc_id, simhash FROM shash",

    "simhash_near_pairs" ->
      s"""$simhashCte,
banded AS (SELECT doc_id, simhash, t.range AS band,
    (simhash >> (t.range * 15)) & 32767 AS v
  FROM shash, range(0, 4) t)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8""",

    "phrase_search" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
q AS (SELECT doc_id AS query_id, ws[2:4] AS qs FROM w
  WHERE doc_id % 37 = 1 AND len(ws) >= 4),
toks AS (SELECT doc_id,
    unnest(list_transform(range(1, len(ws) + 1), i -> {'p': i, 'w': ws[i]}), recursive := true)
  FROM w),
qt AS (SELECT query_id,
    unnest(list_transform(range(1, len(qs) + 1), i -> {'i': i, 'w': qs[i]}), recursive := true)
  FROM q),
ql AS (SELECT query_id, len(qs) AS qlen FROM q),
anch AS (SELECT qt.query_id, toks.doc_id, CAST(toks.p - qt.i AS BIGINT) AS anchor, qt.i
  FROM toks JOIN qt ON toks.w = qt.w),
fm AS (SELECT query_id, doc_id, anchor, count(DISTINCT i) AS nm
  FROM anch GROUP BY query_id, doc_id, anchor),
m AS (SELECT f.query_id, f.doc_id, f.anchor
  FROM fm f JOIN ql USING (query_id) WHERE nm = qlen)
SELECT query_id, doc_id, count(*) AS n_occ, min(anchor) AS first_pos
FROM m GROUP BY query_id, doc_id""",

    "pmi_pairs" ->
      """WITH occ AS (SELECT DISTINCT doc_id,
    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term FROM documents),
nd AS (SELECT count(*) AS n_docs FROM documents),
pdf AS (SELECT term, count(*) AS n_t FROM occ GROUP BY term),
top AS (SELECT term, n_t FROM pdf ORDER BY n_t DESC, term LIMIT 40),
focc AS (SELECT o.doc_id, o.term, t.n_t FROM occ o JOIN top t USING (term)),
p AS (SELECT x.term AS term_a, y.term AS term_b, x.n_t AS n_a, y.n_t AS n_b,
    count(*) AS n_ab
  FROM focc x JOIN focc y ON x.doc_id = y.doc_id AND x.term < y.term
  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5)
SELECT term_a, term_b, n_ab, n_a, n_b,
  CAST((n_ab::HUGEINT * n_docs * 10000) // (n_a::HUGEINT * n_b) AS BIGINT) AS ratio_e4
FROM p, nd"""
  )

  /** Shared oracle CTE: fixed-length token segments (`segs`), the
    * oracle twin of Dedup.segments at SegLen. DuckDB's unnest-in-SELECT
    * repeats sibling columns per element; list slices are 1-based
    * inclusive, clipped at the end like Spark's slice. */
  private lazy val segmentCte =
    s"""WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents),
s0 AS (SELECT doc_id, ws, unnest(range(0, (len(ws) + ${SegLen - 1}) // $SegLen)) AS i
  FROM w WHERE len(ws) >= 1),
segs AS (SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
    array_to_string(ws[i*$SegLen+1 : i*$SegLen+$SegLen], ' ') AS seg
  FROM s0)"""

  /** Shared oracle CTE computing per-doc SimHash (`shash`). */
  private lazy val simhashCte: String =
    s"""WITH dwords AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents),
dw AS (SELECT DISTINCT doc_id, unnest(ws) AS w FROM dwords),
wh AS (SELECT doc_id, ${oh60("w", 0)} AS h FROM dw),
bits AS (SELECT doc_id, t.range AS b,
    sum(CASE WHEN (h >> t.range) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM wh, range(0, 60) t GROUP BY doc_id, t.range),
shash AS (SELECT doc_id,
  CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id)"""
}
