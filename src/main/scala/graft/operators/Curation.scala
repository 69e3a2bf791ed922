package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CheckpointScope.Scoped

/**
 * Corpus-curation operators — the selection/cleaning steps of a
 * training-data pipeline that sit between raw ingest and dedup:
 * repetition scoring, PII redaction, deterministic stratified
 * sampling, per-source caps, and corpus-level distribution stats.
 *
 * Everything here is either a per-row projection (redaction, scoring,
 * sampling — embarrassingly parallel, zero shuffle) or a single
 * aggregation/window (cap, histogram — one shuffle on the group key),
 * so the operators scale linearly to 100 TB. All derived metrics are
 * integers and all randomness is md5-derived, keeping the DuckDB
 * oracle comparison bit-exact.
 */
object Curation {

  /** Email-looking spans. RE2-compatible (no backrefs/lookarounds) so
    * Spark (java.util.regex) and DuckDB (RE2) agree on every match. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (phone/account/SSN-shaped). */
  val DigitRunRe = "[0-9]{7,}"

  /**
   * PII redaction: replace email addresses and long digit runs with
   * typed placeholder tokens, keeping match counts for audit. Pure
   * per-row regexp work — codegen'd builtins, no UDF, no shuffle.
   * Order matters and is fixed: emails first (an email may contain a
   * digit run; after `<EMAIL>` substitution it cannot double-count).
   */
  def redactPii(df: DataFrame): DataFrame = {
    val afterEmail = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    df.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(DigitRunRe)).cast("long").as("n_digit_runs"),
      regexp_replace(afterEmail, DigitRunRe, "<NUM>").as("redacted"))
  }

  /**
   * Per-document repetition score — the boilerplate/degenerate-text
   * quality signal (MassiveText-style): the fraction of word bigrams
   * that are repeats of an earlier bigram in the same document, as an
   * integer permille `rep_e3 = (n_bigrams - n_distinct) * 1000 /
   * n_bigrams`. Documents with fewer than 2 tokens have no bigram and
   * are dropped. Per-row array work only — no shuffle.
   */
  def repetitionStats(df: DataFrame): DataFrame =
    df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        expr("transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))").as("bg"))
      .select(col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("long").as("n_distinct_bigrams"),
        expr("""cast(div((size(bg) - size(array_distinct(bg))) * cast(1000 as bigint),
                        size(bg)) as bigint)""").as("rep_e3"))
      .observe("repetition_stats", count(lit(1)).as("n_docs"))

  /**
   * Fused per-document content-gate signals: token count, lexical
   * diversity (`quality_e3`) and bigram repetition (`rep_e3`) from ONE
   * tokenization pass. The unfused spelling —
   * `TextAnalysis.stats(df) ⋈ repetitionStats(df)` — parses every
   * document's full text twice and pays a corpus-wide shuffle join on
   * doc_id just to glue the two projections back together; at 100 TB
   * the join alone is a full-corpus exchange. Values are identical
   * (documents with < 2 tokens drop, matching the inner join against
   * repetitionStats' bigram filter).
   *
   * The trailing `observe` node is a PREDICATE-PUSHDOWN BARRIER (and a
   * free metrics point: every action reports the pre-gate document
   * count). Without it, a consumer's threshold filter is pushed through
   * the projections, inlining the tokenizer into the bigram lambda's
   * per-element accesses — `split(text)[i]` re-tokenizes the document
   * for EVERY bigram, turning a linear per-row operator into O(tokens²)
   * (measured 7.1 s vs 0.3 s on the sf0.1 gate filter; at corpus scale
   * the difference is fatal). Catalyst does not reorder filters across
   * `CollectMetrics`, so the gates evaluate on the materialized signal
   * columns — same rows, one tokenization. [[repetitionStats]] carries
   * the same barrier for the same reason.
   */
  def contentSignals(df: DataFrame): DataFrame =
    TextAnalysis.spread(df)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .withColumn("bg",
        expr("transform(sequence(0, size(ws)-2), i -> concat_ws(' ', ws[i], ws[i+1]))"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        expr("cast(div(cast(size(array_distinct(ws)) as bigint) * 1000, size(ws)) as bigint)")
          .as("quality_e3"),
        expr("""cast(div((size(bg) - size(array_distinct(bg))) * cast(1000 as bigint),
                        size(bg)) as bigint)""").as("rep_e3"))
      .observe("content_signals", count(lit(1)).as("n_docs"))

  /**
   * Deterministic stratified sampling: keep a document iff a
   * 30-bit md5-derived hash of its id, mod 1000, falls under the
   * stratum's permille rate. This is how training mixtures are
   * rebalanced at corpus scale: no RNG state, no sort, no shuffle —
   * the same row is kept on every run, on every cluster size, and the
   * DuckDB oracle reproduces the exact sample. Strata absent from
   * `ratesE3` fall back to `defaultE3`.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       ratesE3: Map[String, Int], defaultE3: Int): DataFrame = {
    val rateMap = map(ratesE3.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.filter(
      expr("cast(conv(substr(md5(concat('smp:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 1000")
        < coalesce(element_at(rateMap, col(stratumCol)), lit(defaultE3)))
  }

  /**
   * Deterministic weight-proportional sampling (priority sampling, the
   * fixed-hash variant of Efraimidis–Spirakis exponential clocks): each
   * document draws a 32-bit uniform `h` from md5 of its id and keeps
   * the `k` SMALLEST priorities `pri = (h·10^6) div weight` — a
   * heavier document gets a proportionally smaller priority, so the
   * sample tilts toward weight exactly like u^(1/w) ranking does in
   * the small-probability regime, but every quantity is an exact
   * BIGINT both engines reproduce bit-for-bit (no pow, no RNG state).
   *
   * Weight here is the whitespace token count (≥ 1) — "sample
   * proportional to training tokens", the curation shape for building
   * a length-balanced subset. Selection is `TakeOrderedAndProject`:
   * per-partition priority queues of size k, a k-row driver merge —
   * never a global sort, so the operator is one scan at any corpus
   * size.
   */
  def weightedSample(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"),
        greatest(lit(1L), size(TextAnalysis.tokens(col("text"))).cast("long")).as("w"),
        expr("cast(conv(substr(md5(concat('wsmp:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)")
          .as("h"))
      .withColumn("pri", expr("div(h * 1000000, w)"))
      .orderBy(col("pri"), col("doc_id"))
      .limit(k)
      .select("doc_id", "w", "pri")

  /**
   * Per-source document cap — the per-host/per-domain cap of web-corpus
   * curation (no single source may dominate the training mixture).
   * Keeps the `n` lowest doc_ids per source with their rank.
   *
   * TakeOrdered-shaped, NOT a window: a bounded top-n aggregate
   * (Catalyst's `CollectTopK` — a size-n priority queue per group,
   * map-side combinable), so each partition reduces a source to ≤ n ids
   * BEFORE the shuffle and no executor ever sorts a whole source. The
   * windowed `row_number` spelling this replaces put a mega-source's
   * every row into one sorted partition — the classic curation skew
   * trap (one giant crawl domain stalls the stage). Ranks match the
   * window exactly: doc_ids are ranked ascending, and for duplicate
   * ids either spelling numbers equal values arbitrarily-but-equally.
   */
  def sourceCap(df: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val topN = Bridge.collectTopK(Bridge.expression(col("doc_id")), n, reverse = true)
    df.select(col("doc_id"), col("source"))
      .groupBy("source")
      .agg(sort_array(topN).as("ids"))
      .select(col("source"), posexplode(col("ids")))
      .select(col("col").as("doc_id"), col("source"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  /**
   * Deterministic corpus sharding for training-data export:
   * `(doc_id, shard, pos)` with `shard = md5-hash(doc_id) % nShards`
   * and `pos` = the document's rank within its shard (hash order,
   * doc_id ties) — a reproducible global shuffle, the step that turns
   * a curated corpus into N equally-mixed training files in a fixed
   * order on every run and every cluster size.
   *
   * The per-shard rank is a window, but partitioned by SHARD: the sort
   * is corpus/nShards rows per partition, and nShards is chosen by the
   * writer (thousands at 100 TB), so no partition is corpus-sized —
   * and a sorted order per shard is the point of the operator (shards
   * are written sequentially), so the sort is irreducible work, not
   * overhead.
   */
  def shardAssign(df: DataFrame, nShards: Int): DataFrame =
    df.select(col("doc_id"),
        expr("cast(conv(substr(md5(concat('shard:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)")
          .as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy("h", "doc_id")).cast("long"))
      .select("doc_id", "shard", "pos")

  /**
   * Benchmark decontamination: per-document overlap between the corpus
   * and an evaluation set, measured in distinct word-k-shingles (k = 5
   * by default — the n-gram-overlap rule every serious pretraining
   * pipeline applies so benchmark answers don't leak into training
   * data). Returns `(doc_id, n_sh, n_overlap, contaminated)` for every
   * corpus document with at least one k-shingle; `contaminated = 1` iff
   * any shingle also appears in any eval document (the standard
   * any-hit rule — a single leaked benchmark n-gram disqualifies).
   *
   * Scale shape: the eval side is benchmark suites — megabytes against
   * a 100 TB corpus — so its distinct shingle set is BROADCAST and the
   * only shuffle is the per-document aggregate. The corpus side is
   * never joined on a shingle key against itself, so shingle skew
   * cannot blow up the join (the broadcast hash lookup is per-row).
   */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, k: Int = 5): DataFrame = {
    val evalSh = TextAnalysis.shingles(evalSet, k).select("sh").distinct()
    TextAnalysis.shingles(corpus, k)
      .join(broadcast(evalSh.withColumn("hit", lit(1L))), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .select(col("doc_id"), col("n_sh"), col("n_overlap"),
        when(col("n_overlap") >= 1, 1).otherwise(0).as("contaminated"))
  }

  /**
   * [[decontaminate]] for the regime where the eval/blocklist side is
   * too large to broadcast (a merged mega-benchmark suite, a
   * competitor-corpus blocklist — tens of GB of shingles against a
   * 100 TB corpus): value-identical output, different join physics.
   *
   * A BLOOM FILTER over the eval shingle hashes (built in one
   * map-side-combinable aggregate pass — Catalyst's own
   * `BloomFilterAggregate`, ~`bitsPerItem`/8 bytes per shingle, 40×
   * smaller than a broadcast hash table of the strings) prefilters the
   * corpus side BEFORE the exchange: a bloom miss is DEFINITIVE
   * absence (no false negatives), so only bloom-positive shingles —
   * true overlaps plus the fpp·n false positives — enter the
   * shuffle join, and the join re-verifies them exactly, keeping the
   * result bit-identical to [[decontaminate]]. Per-document totals
   * come from a separate narrow pre-aggregate (count per doc_id,
   * map-side combined), so the full corpus shingle stream is never
   * exchanged at all: the only corpus-scale shuffle carries
   * ~(true overlap + fpp·corpus) rows.
   */
  def decontaminateAtScale(corpus: DataFrame, evalSet: DataFrame, k: Int = 5,
                           bitsPerItem: Long = 20L): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val evalSh = TextAnalysis.shingles(evalSet, k).select("sh").distinct()
    // one aggregate pass builds the filter; the driver holds only the
    // serialized bitset (metadata-scale), shipped to executors as a
    // plan literal — the same transport Spark's runtime filters use
    val bloomBytes = Dedup.bloomBytes(evalSh, xxhash64(col("sh")), bitsPerItem)
    val sh = TextAnalysis.shingles(corpus, k)
    val totals = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits =
      if (bloomBytes.isEmpty) { // empty eval side: nothing can overlap
        totals.select(col("doc_id"), lit(0L).as("n_overlap")).limit(0)
      } else {
        sh.filter(Bridge.bloomMightContain(lit(bloomBytes), xxhash64(col("sh"))))
          // exact re-verify of the bloom survivors — deliberately NOT
          // broadcast-hinted: this operator exists for the
          // eval-side-too-big-to-broadcast regime (AQE may still pick a
          // broadcast when the fixture side is tiny; the semantics and
          // the prefilter are unchanged either way)
          .join(evalSh.withColumn("hit", lit(1L)), Seq("sh"), "left")
          .groupBy("doc_id").agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      }
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(coalesce(col("n_overlap"), lit(0L)) >= 1, 1).otherwise(0).as("contaminated"))
  }

  /**
   * Span-level decontamination report — the surgical complement of
   * [[decontaminate]]: instead of flagging whole documents, emit EVERY
   * matched eval k-shingle occurrence with its exact location, so a
   * pipeline can redact the contaminated span and keep the document.
   * One row per occurrence: `(doc_id, start_tok, start_char, end_char,
   * sh)` — token index of the shingle's first token, and [start, end)
   * character offsets into the whitespace-collapsed normalized text
   * (`regexp_replace(lower(trim(text)), '\s+', ' ')` — the same
   * canonical form [[TextAnalysis.fingerprint]] hashes), where
   * `end_char − start_char = length(sh)`.
   *
   * Scale shape: positions come from one per-document window (token
   * ordinal + running character offset — document-sized partitions,
   * never corpus-sized), shingles from `k−1` `lead`s over the same
   * window, and the eval side broadcasts exactly as [[decontaminate]];
   * in the too-big-to-broadcast regime prefilter `sh` with the
   * [[decontaminateAtScale]] bloom before this join — a miss is
   * definitive, so the span set is unchanged.
   */
  def decontaminateSpans(corpus: DataFrame, evalSet: DataFrame,
                         k: Int = 5): DataFrame = {
    val evalSh = TextAnalysis.shingles(evalSet, k).select("sh").distinct()
    val toks = TextAnalysis.spread(corpus)
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))))
      .toDF("doc_id", "pos", "w")
    val ord = Window.partitionBy("doc_id").orderBy("pos")
    val offWin = ord.rowsBetween(Window.unboundedPreceding, -1)
    val leads = (1 until k).map(j => lead(col("w"), j).over(ord))
    val shCol =
      if (k == 1) col("w")
      else when(leads.last.isNotNull, concat_ws(" ", (col("w") +: leads): _*))
    toks
      .withColumn("start_char",
        coalesce(sum(length(col("w")) + 1).over(offWin), lit(0L)))
      .withColumn("sh", shCol)
      .filter(col("sh").isNotNull)
      .join(broadcast(evalSh), Seq("sh"))
      .select(col("doc_id"),
        col("pos").cast("long").as("start_tok"),
        col("start_char").cast("long").as("start_char"),
        (col("start_char") + length(col("sh"))).cast("long").as("end_char"),
        col("sh"))
  }

  /**
   * Token-stream packing offsets — the final layout step of a
   * pretraining-data build: documents are concatenated (in the
   * reproducible hash order of [[shardAssign]], per shard) into one
   * token stream per shard, and the stream is cut into fixed-length
   * training sequences. For each document this returns its shard, its
   * start offset in the shard's token stream, and the index of the
   * training sequence containing its first token:
   * `(doc_id, shard, n_tokens, start_off, seq_idx)`.
   *
   * The running-offset window partitions by SHARD (corpus/nShards rows
   * per partition, nShards writer-chosen — thousands at 100 TB), and a
   * per-shard sorted order is the operator's OUTPUT contract, so the
   * sort is irreducible work, not overhead — same argument as
   * [[shardAssign]].
   */
  def packOffsets(df: DataFrame, nShards: Int, seqLen: Int): DataFrame =
    df.select(col("doc_id"),
        expr("cast(conv(substr(md5(concat('shard:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)")
          .as("h"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("end_off",
        sum(col("n_tokens")).over(Window.partitionBy("shard").orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        expr(s"cast(div(end_off - n_tokens, $seqLen) as bigint)").as("seq_idx"))

  /**
   * Whole-document sequence packing, BEST-FIT-DECREASING — the packing
   * mode where documents must NOT cross sequence boundaries (each
   * training sequence holds whole documents ≤ `seqLen`; leftover space
   * is PADDING a real training run pays for). [[packOffsets]] streams
   * documents across boundaries (no padding, but fragments); this is
   * the other production trade, and arrival-order packing
   * ([[packWholeNaive]]) wastes measurably more pad tokens than BFD.
   *
   * Deterministic algorithm, oracle-matched bit for bit: within each
   * shard, documents sort by (effective length DESC, doc_id) —
   * effective length = `min(n_tokens, seqLen)` (over-long documents
   * truncate, the standard treatment) — and each document goes to the
   * open bin with the HIGHEST fill that still fits (ties → lowest bin
   * index), else opens a new bin. Returns
   * `(doc_id, shard, n_tokens, bin_idx, start_off)` — `start_off` is
   * the offset inside the bin, `n_tokens` the effective length.
   *
   * Scale shape: one shuffle on `shard` (writer-chosen, thousands at
   * 100 TB), then a per-shard sequential fold over the shard's
   * MANIFEST — `(doc_id, length)` pairs, never text — exactly the
   * in-memory state a shard writer holds anyway. Sequential-with-state
   * per group is what `flatMapGroups` exists for; the corpus-wide
   * stream stays distributed.
   */
  def packBestFit(df: DataFrame, nShards: Int, seqLen: Int): DataFrame =
    packWhole(df, nShards, seqLen, bestFit = true)

  /** Arrival-order (shard-hash order) NEXT-fit whole-document packing —
    * the naive baseline a pipeline gets without sorting: only the last
    * bin is open; a document that does not fit closes it forever. Same
    * output schema as [[packBestFit]]; exists to make the padding cost
    * of naive packing measurable ([[packPadding]]). */
  def packWholeNaive(df: DataFrame, nShards: Int, seqLen: Int): DataFrame =
    packWhole(df, nShards, seqLen, bestFit = false)

  private def packWhole(df: DataFrame, nShards: Int, seqLen: Int,
                        bestFit: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val manifest = df.select(col("doc_id"),
        expr("cast(conv(substr(md5(concat('shard:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)")
          .as("h"),
        least(size(TextAnalysis.tokens(col("text"))).cast("long"),
          lit(seqLen.toLong)).as("eff"))
      .select(col("doc_id"), col("h"), (col("h") % nShards).cast("int").as("shard"),
        col("eff"))
      .as[(Long, Long, Int, Long)]
    manifest.groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val docs = it.toArray
        val sorted =
          if (bestFit) docs.sortBy(d => (-d._4, d._1)) // eff desc, doc_id
          else docs.sortBy(d => (d._2, d._1))          // arrival: h, doc_id
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        // best-fit lookup structure: fill -> open bin indices at that
        // fill. floorEntry(seqLen - eff) is "the HIGHEST fill that
        // still fits" and first() is "ties -> lowest bin index" — the
        // exact linear-scan tie rule at O(log B) per placement instead
        // of O(B) (which went quadratic per shard past ~10^5 docs)
        val byFill = new java.util.TreeMap[Long, java.util.TreeSet[Integer]]()
        def link(fill: Long, i: Int): Unit =
          byFill.computeIfAbsent(fill, _ => new java.util.TreeSet[Integer]())
            .add(Integer.valueOf(i))
        def unlink(fill: Long, i: Int): Unit = {
          val s = byFill.get(fill)
          s.remove(Integer.valueOf(i))
          if (s.isEmpty) byFill.remove(fill)
        }
        sorted.iterator.map { d =>
          val eff = d._4
          var best = -1
          var bestFill = -1L
          if (bestFit) {
            val e = byFill.floorEntry(seqLen - eff)
            if (e != null) { bestFill = e.getKey; best = e.getValue.first() }
          } else if (fills.nonEmpty && fills.last + eff <= seqLen) {
            best = fills.length - 1; bestFill = fills.last
          }
          if (best < 0) {
            fills += eff
            if (bestFit) link(eff, fills.length - 1)
            (d._1, shard, eff, fills.length - 1, 0L)
          } else {
            if (bestFit) unlink(bestFill, best)
            fills(best) += eff
            if (bestFit) link(fills(best), best)
            (d._1, shard, eff, best, bestFill)
          }
        }
      }
      .toDF("doc_id", "shard", "n_tokens", "bin_idx", "start_off")
  }

  /** Padding audit of a whole-document packing: per shard, the bins
    * used and the fraction of the shard's token slots spent on padding
    * (`padding_e6`, exact integer permillion — the pad-token cost a
    * training run pays for this packing). */
  def packPadding(packed: DataFrame, seqLen: Int): DataFrame =
    packed.groupBy("shard").agg(
        (max(col("bin_idx")) + 1).cast("long").as("n_bins"),
        sum(col("n_tokens")).as("used"))
      .select(col("shard"), col("n_bins"),
        expr(s"cast(div((n_bins * $seqLen - used) * 1000000, n_bins * $seqLen) as bigint)")
          .as("padding_e6"))

  /**
   * Training-sequence provenance — the inverse lookup of
   * [[packOffsets]]: for every fixed-length training sequence, which
   * documents contribute tokens to it and how many. This is the
   * data-lineage table every serious pretraining pipeline keeps (legal
   * takedown of a document → which shipped sequences are affected;
   * a loss-spike at sequence (s, i) → which documents fed it).
   * Returns `(shard, seq_idx, doc_id, n_tokens_in_seq)`; summing
   * `n_tokens_in_seq` per (shard, seq_idx) gives exactly `seqLen`
   * for every interior sequence.
   *
   * Scale shape: the offsets come from [[packOffsets]] (per-shard
   * window, irreducible); the explode fans each document out to the
   * ceil(n_tokens/seqLen)+1 sequences it touches — output-proportional
   * work, no extra shuffle. Token-in-sequence counts are exact integer
   * interval intersections.
   */
  def seqProvenance(df: DataFrame, nShards: Int, seqLen: Int): DataFrame =
    packOffsets(df, nShards, seqLen)
      .withColumn("end_off", col("start_off") + col("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("shard"), col("start_off"), col("end_off"),
        explode(expr(
          s"sequence(cast(div(start_off, $seqLen) as bigint), cast(div(end_off - 1, $seqLen) as bigint))"))
          .as("seq_idx"))
      .select(col("shard"), col("seq_idx"), col("doc_id"),
        (least(col("end_off"), (col("seq_idx") + 1) * seqLen) -
          greatest(col("start_off"), col("seq_idx") * seqLen)).as("n_tokens_in_seq"))

  /**
   * Token-budget selection — "take the highest-quality documents until
   * the training budget is spent": documents ordered by
   * (`quality_e3` desc, `doc_id`), selected while the running token sum
   * stays within `budgetTokens`. The semantics are a global ordered
   * prefix, but the implementation never globally sorts the corpus:
   *
   *   1. one map-side-combinable aggregate builds the per-quality-bucket
   *      token mass — `quality_e3` is a permille, so this is ≤ 1001 rows
   *      and collecting it to the driver is metadata-scale at any corpus
   *      size;
   *   2. the driver walks the histogram to find the boundary bucket q*:
   *      every document with quality > q* fits in the budget outright
   *      (a pure filter, no sort, no shuffle);
   *   3. only the boundary BUCKET pays a ranking window — one quality
   *      stratum, not the corpus; and if that single stratum is itself
   *      too large to sort in one partition (> `windowRows` rows —
   *      degenerate corpora where most documents share one quality
   *      value), [[orderedDocIdPrefix]] recurses the SAME histogram
   *      trick on doc_id ranges until the surviving slice fits the
   *      window. The driver never holds more than a bounded histogram
   *      per level, and levels are logarithmic in the id range.
   *
   * Requires `doc_id` unique (the corpus primary key — same
   * precondition as the oracle's window spelling). Returns
   * `(doc_id, n_tokens, quality_e3)` of the selected documents —
   * value-identical to the one-big-window spelling the DuckDB oracle
   * uses, for any budget.
   */
  def budgetSelect(df: DataFrame, budgetTokens: Long,
                   windowRows: Long = 1L << 22): DataFrame = {
    // same materialize-the-narrow-signals-once shape as mixtureSelect:
    // the histogram pass, the cutoff filter and every recursion level
    // of the boundary prefix read the checkpointed 3-column table
    // instead of re-running the tokenizer per pass
    val s = TextAnalysis.stats(df).select("doc_id", "n_tokens", "quality_e3")
      .scopedCheckpoint()
    val hist = s.groupBy("quality_e3").agg(sum("n_tokens").as("mass"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    var above = 0L
    var cutoff = Long.MinValue
    for ((q, m) <- hist if cutoff == Long.MinValue)
      if (above + m <= budgetTokens) above += m else cutoff = q
    if (cutoff == Long.MinValue) s // the whole corpus fits the budget
    else {
      val remaining = budgetTokens - above
      val boundary = orderedDocIdPrefix(
        s.filter(col("quality_e3") === cutoff), remaining, windowRows)
      s.filter(col("quality_e3") > cutoff).union(boundary)
    }
  }

  /**
   * Per-group token-budget selection — the mixture-control step of a
   * training-data build ("this release is 60 % web, 30 % code, 10 %
   * books, best documents first"): within every group, select the
   * best-quality documents whose running token sum stays inside that
   * group's budget. Selection within a group is [[budgetSelect]]'s
   * rule exactly (full quality strata while they fit, then a
   * doc_id-ordered prefix of the boundary stratum) — value-identical
   * to a per-group (quality desc, doc_id) running-sum window, which is
   * how the DuckDB oracle spells it.
   *
   * Scale shape: ONE map-side-combinable aggregate builds the
   * (group × permille-quality) histogram — ≤ |groups|·1001 rows to the
   * driver; ONE further corpus scan applies every group's cutoff at
   * once (a literal group→cutoff map filter), and only each group's
   * single boundary stratum pays an extra [[orderedDocIdPrefix]] pass —
   * no global sort and no corpus-wide window anywhere. Groups are a
   * mixture axis (languages, sources, domains) — tens, not millions;
   * groups absent from `budgets` are dropped.
   */
  def mixtureSelect(df: DataFrame, budgets: Map[String, Long],
                    groupCol: String = "lang",
                    windowRows: Long = 1L << 22): DataFrame = {
    // localCheckpoint: the narrow signal table (4 columns, ~32 bytes a
    // row — the TEXT stays behind) is read by the histogram pass, the
    // cutoff filter and every boundary-stratum recursion; without it
    // each pass re-runs the tokenizer over the corpus (and a filter
    // pushed into the projection would inline it twice more). This is
    // the materialize-the-stats-table-once shape a production build
    // uses; blocks live until the result is consumed (see spanDedup's
    // lifetime note).
    val s = df
      .withColumn("ws", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col(groupCol).as("grp"),
        size(col("ws")).cast("long").as("n_tokens"),
        expr("cast(div(cast(size(array_distinct(ws)) as bigint) * 1000, size(ws)) as bigint)")
          .as("quality_e3"))
      .scopedCheckpoint()
    val hist = s.groupBy("grp", "quality_e3").agg(sum("n_tokens").as("mass"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    // per-group cutoff: -1 = the whole group fits (qualities are >= 0)
    val cuts = budgets.toSeq.sortBy(_._1).map { case (g, budget) =>
      val strata = hist.getOrElse(g, Array.empty)
        .map(t => (t._2, t._3)).sortBy(-_._1)
      var above = 0L
      var cutoff = -1L
      for ((q, m) <- strata if cutoff < 0)
        if (above + m <= budget) above += m else cutoff = q
      (g, cutoff, budget - above)
    }
    if (cuts.isEmpty)
      return s.filter(lit(false))
        .select(col("doc_id"), col("grp").as(groupCol),
          col("n_tokens"), col("quality_e3"))
    // the above-cutoff mass of EVERY group in ONE corpus scan, via a
    // (group -> cutoff) literal map; groups without a budget fall to
    // the MaxValue coalesce and drop out (try_element_at: ANSI-safe on
    // missing keys). Only the boundary strata pay a further pass each.
    // Built with Column literals, not SQL text: group values may hold
    // quotes/backslashes, which SQL-literal escaping would mangle.
    val cutMap = map(cuts.flatMap { case (g, c, _) =>
      Seq(lit(g), lit(c)) }: _*)
    val above = s.filter(col("quality_e3") >
      coalesce(try_element_at(cutMap, col("grp")), lit(Long.MaxValue)))
    val boundaries = cuts.collect { case (g, cutoff, remaining) if cutoff >= 0 =>
      orderedDocIdPrefix(
        s.filter(col("grp") === g && col("quality_e3") === cutoff),
        remaining, windowRows)
    }
    (above +: boundaries).reduce(_ union _)
      .select(col("doc_id"), col("grp").as(groupCol),
        col("n_tokens"), col("quality_e3"))
  }

  /**
   * The doc_id-ordered token-budget prefix of `s` (`(doc_id, n_tokens,
   * …)`, doc_id unique): the rows whose running `n_tokens` sum in
   * doc_id order stays ≤ `remaining` — WITHOUT ever globally sorting
   * more than `windowRows` rows. While the slice is larger, one
   * map-side-combinable aggregate buckets the doc_id VALUE RANGE into
   * ≤ `buckets` ranges, the driver walks the (bounded) histogram to
   * find the boundary range — every earlier range is included outright
   * by a pure filter — and the recursion descends into the boundary
   * range alone with the leftover budget. Each level divides the id
   * range by `buckets`, so depth ≤ log_buckets(idRange) ≈ 7 for the
   * full 63-bit id space at the default 1024; only the terminal slice
   * (≤ windowRows rows, or a single doc_id value) pays the
   * single-partition ranking window.
   *
   * TERMINATION (structural): at every recursive call lo < hi, so
   * width ≥ 1 and the boundary bucket's id range is a strict subset of
   * the parent's — the range cannot stop shrinking, and the lo == hi
   * terminal catches the degenerate floor. The depth bound is pinned by
   * the windowRows=1 probe in CurationSpec ("orderedDocIdPrefix
   * recursion matches the window at every budget"), which forces every
   * level to recurse to single-id leaves and still agree with the
   * running-sum oracle.
   */
  private[graft] def orderedDocIdPrefix(s: DataFrame, remaining: Long,
                                        windowRows: Long,
                                        buckets: Int = 1024): DataFrame = {
    val cols = s.columns.toSeq.map(col)
    val Array(head) = s.agg(count(lit(1)).as("n"),
      coalesce(min("doc_id"), lit(0L)).as("lo"),
      coalesce(max("doc_id"), lit(0L)).as("hi"),
      coalesce(sum("n_tokens"), lit(0L)).as("total")).collect()
    val (n, lo, hi, total) =
      (head.getLong(0), head.getLong(1), head.getLong(2), head.getLong(3))
    if (total <= remaining) s // the whole slice fits
    else if (n <= windowRows || lo == hi) {
      // terminal: small enough to sort in one partition (or a single
      // doc_id value, where no range can shrink further)
      s.withColumn("cum", sum(col("n_tokens")).over(
          Window.orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") <= remaining)
        .select(cols: _*)
    } else {
      // math.ceil without overflow: hi - lo < 2^63 is guaranteed, and
      // width >= 2 because lo < hi here, so the range strictly shrinks
      val width = (hi - lo) / buckets + 1
      // integer div, not `/` (Divide is floating-point on longs and a
      // double's 53-bit mantissa mis-buckets large ids)
      val bucketOf = expr(s"div(doc_id - ${lo}L, ${width}L)")
      val bhist = s.groupBy(bucketOf.as("b")).agg(sum("n_tokens").as("mass"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var above = 0L
      var boundary = -1L
      for ((b, m) <- bhist if boundary < 0)
        if (above + m <= remaining) above += m else boundary = b
      // boundary >= 0 always: total > remaining, so some bucket breaks
      val included = s.filter(bucketOf < boundary)
      included.union(orderedDocIdPrefix(
        s.filter(bucketOf === boundary), remaining - above, windowRows, buckets))
    }
  }

  /**
   * Corpus mixture report: per-stratum document and token mass with an
   * integer permille share — the accounting run before and after every
   * curation step to keep the training mixture on target. One
   * map-side-combinable aggregation over the corpus; the share window
   * runs over the per-stratum AGGREGATE (strata-count rows, metadata
   * scale), never the corpus.
   */
  def mixtureReport(df: DataFrame, stratumCol: String = "lang"): DataFrame =
    df.select(col(stratumCol).as("stratum"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("tokens_e3",
        expr("cast(div(n_tokens * cast(1000 as bigint), sum(n_tokens) over ()) as bigint)"))

  /**
   * Corpus token-length histogram: document counts and token mass per
   * fixed-width token-count bucket — the shape check run before and
   * after every curation step. One aggregation, map-side combinable,
   * output is O(buckets).
   */
  def tokenHistogram(df: DataFrame, bucketWidth: Int = 25): DataFrame =
    TextAnalysis.stats(df)
      .select((expr(s"div(n_tokens, $bucketWidth)") * bucketWidth).as("bucket"),
        col("n_tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens_total"))

  /**
   * Snapshot diff between two corpus versions — the release-to-release
   * bookkeeping of a continuously rebuilt corpus: `(doc_id, status)`
   * with status `added` / `removed` / `changed` (docs identical in
   * both snapshots are dropped — at 100 TB the unchanged mass is the
   * bulk and nobody materializes it). Content comparison is by md5
   * FINGERPRINT projected before the join, so document text never
   * crosses the exchange; the join itself is one doc_id-keyed shuffle
   * (bucketed snapshot layouts co-locate it away entirely).
   */
  def corpusDiff(prev: DataFrame, next: DataFrame): DataFrame = {
    val a = prev.select(col("doc_id"), md5(col("text")).as("fp_prev"))
    val b = next.select(col("doc_id"), md5(col("text")).as("fp_next"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_prev").isNull, lit("added"))
          .when(col("fp_next").isNull, lit("removed"))
          .when(col("fp_prev") =!= col("fp_next"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /**
   * Hierarchical k-anonymity generalization over a quasi-identifier
   * ladder — the privacy gate a training-data release pipeline runs
   * before shipping user-derived records (k-anonymity per Sweeney 2002;
   * the generalization-lattice framing per Samarati 1998, both public).
   *
   * Quasi-identifiers, most→least specific: `(nat, seg, band)` where
   * `band` buckets `c_acctbal` into `bandWidth`-wide bins. Each row is
   * published at the FIRST ladder level whose cohort reaches `k`
   * occupants — level 0 keeps the full tuple, level 1 drops the band,
   * level 2 drops the segment, level 3 suppresses every quasi attribute
   * (always k-anonymous). Generalized-away attributes surface as NULL.
   *
   * Scale shape: the entire generalization lattice comes from ONE
   * `rollup` pass over the data (map-side partial aggregation; the
   * grouping-id distinguishes ladder levels from genuine NULLs), and
   * the per-row level choice is three BROADCAST joins — the lattice is
   * cohort-scale (bounded by the quasi-attribute cross cardinality,
   * never by row count), so nothing but the one rollup shuffle touches
   * data scale. Output is the anonymized cohort table
   * `(lvl, p_nat, p_seg, p_band, n, id_sum)` — `id_sum` pins the exact
   * row multiset behind each published cohort.
   */
  def kAnonymize(customers: DataFrame, k: Long, bandWidth: Int): DataFrame = {
    val rows = customers.select(
      col("c_custkey").cast("long").as("id"),
      col("c_nationkey").as("nat"),
      col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / lit(bandWidth.toDouble)).cast("long").as("band"))
    val lattice = rows.rollup(col("nat"), col("seg"), col("band"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("csize"))
    val l0 = lattice.filter(col("gid") === 0)
      .select(col("nat").as("n0"), col("seg").as("s0"), col("band").as("b0"),
        col("csize").as("c0"))
    val l1 = lattice.filter(col("gid") === 1)
      .select(col("nat").as("n1"), col("seg").as("s1"), col("csize").as("c1"))
    val l2 = lattice.filter(col("gid") === 3)
      .select(col("nat").as("n2"), col("csize").as("c2"))
    // NULL-SAFE joins: a genuinely-NULL quasi attribute is a cohort
    // value like any other (the rollup already counts it; gid keeps it
    // distinct from generalized-away levels) — a plain equi-join would
    // silently DROP null-keyed rows from the release, under-reporting
    // records instead of publishing them at their k-reaching level
    rows
      .join(broadcast(l0), col("nat") <=> col("n0") &&
        col("seg") <=> col("s0") && col("band") <=> col("b0"))
      .join(broadcast(l1), col("nat") <=> col("n1") && col("seg") <=> col("s1"))
      .join(broadcast(l2), col("nat") <=> col("n2"))
      .withColumn("lvl",
        when(col("c0") >= k, 0).when(col("c1") >= k, 1)
          .when(col("c2") >= k, 2).otherwise(3))
      .groupBy(col("lvl"),
        when(col("lvl") <= 2, col("nat")).as("p_nat"),
        when(col("lvl") <= 1, col("seg")).as("p_seg"),
        when(col("lvl") === 0, col("band")).as("p_band"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
  }
}
