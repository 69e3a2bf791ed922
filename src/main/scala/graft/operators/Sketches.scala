package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable corpus-profiling sketches — the fixed-size summaries a
 * 100 TB pipeline keeps instead of exact state: HyperLogLog distinct
 * counting (Flajolet et al. 2007) and Count-Min frequency estimation /
 * heavy hitters (Cormode & Muthukrishnan 2005). Everything is exact
 * INTEGER arithmetic over an md5-derived 60-bit hash (the same
 * [[Dedup]] family hash), so every register, counter, and final
 * estimate hash-matches a DuckDB replay.
 *
 * Scale shape — the whole point of a sketch:
 *  - HLL registers are a `groupBy(reg).max(rho)` — max is commutative
 *    and associative, so the shuffle after map-side partial
 *    aggregation carries at most `m` cells PER PARTITION regardless of
 *    corpus size, and two corpora's register tables merge by
 *    element-wise max (incremental / cross-shard union for free).
 *  - CM counters are a `groupBy(depth, bucket).sum` — same partial-agg
 *    bound at `d·w` cells per partition; two sketches merge by
 *    element-wise sum. Point queries are a broadcast lookup against
 *    the `d·w`-row counter table.
 *
 * The verification gates deliberately ALSO compute the exact answer
 * (count-distinct / exact top-k) next to the estimate — affordable at
 * test scale, and it turns each gate into a standing accuracy probe
 * (HLL standard error 1.04/√m ≈ 6.5% at m=256; CMS overestimates by
 * at most εN with ε = e/w). Production callers at 100 TB run only the
 * sketch side.
 */
object Sketches {

  /** HLL register count m (power of two; 8-bit register index). */
  val HllM = 256

  /** HLL bias constant α_m for m = 256, in 1e-5 fixed point:
    * 0.7213/(1 + 1.079/m). */
  val AlphaE5 = 71827L

  /** Count-Min depth (independent hash rows) and width (buckets/row). */
  val CmDepth = 4
  val CmWidth = 512

  /** Seed base shared with the oracle spelling. */
  val HllSeed = 77
  val CmSeedBase = 101

  /** 60-bit md5-derived hash — the dialect-shared family hash
    * (engine twin of the oracle's `('0x' || substr(md5(...), 1, 15))`). */
  private def h60(c: Column, seed: Int): Column =
    expr(s"cast(conv(substr(md5(concat('$seed:', ${c.toString})), 1, 15), 16, 10) as bigint)")

  /** One row per whitespace token of the normalized `text` column. */
  private def words: Column = explode(TextAnalysis.tokens(col("text")))

  /**
   * The HLL register table over the corpus vocabulary: `(reg, rho)`
   * for ALL `m` registers (absent registers rho 0). Register index is
   * the hash's low 8 bits; `rho` is the 1-based position of the first
   * set bit in the remaining 52 (all-zero → 53). Duplicate tokens
   * cost nothing beyond the scan — max absorbs them map-side.
   */
  def hllRegisters(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val h = docs.select(words.as("w"))
      .select(h60(col("w"), HllSeed).as("h"))
      .select((col("h") % HllM).as("reg"),
        expr("h div 256").as("rest"))
      // bin() has no leading zeros: length = floor(log2)+1, so
      // rho = 52 - (length-1) + 1 = 53 - length; rest = 0 → 53
      .select(col("reg"),
        when(col("rest") === 0L, lit(53))
          .otherwise(lit(53) - length(expr("bin(rest)"))).cast("int").as("rho"))
      .groupBy("reg").agg(max(col("rho")).as("rho"))
    spark.range(0, HllM).select(col("id").as("reg"))
      .join(h, Seq("reg"), "left")
      .select(col("reg"), coalesce(col("rho"), lit(0)).cast("int").as("rho"))
  }

  /**
   * The raw-estimator HLL distinct count next to the exact answer:
   * one row `(n_exact, n_est, err_bp)`. The estimate is
   * `α_m · m² / Σ_j 2^(−M_j)` computed exactly: each summand is scaled
   * by 2^53 (`M_j ≤ 53`, so `2^(53−M_j)` is an exact BIGINT; the sum
   * is ≤ m·2^53 < 2^62), and the final division widens to
   * DECIMAL(38,0) — bit-identical to the oracle's HUGEINT replay. No
   * small-range (linear-counting) correction: the gate corpus sits in
   * the raw-estimator regime, and the correction needs a float `ln`.
   */
  def hllDistinct(docs: DataFrame): DataFrame = {
    val exact = docs.select(words.as("w"))
      .agg(count_distinct(col("w")).as("n_exact"))
    exact.crossJoin(broadcast(hllEstimate(hllRegisters(docs))))
      .select(col("n_exact"), col("n_est"),
        expr("abs(n_est - n_exact) * 10000 div n_exact").as("err_bp"))
  }

  /** The raw HLL estimate `(n_est)` from a DENSE `(reg, rho)` register
    * table — the read side of any register log (batch, merged shards,
    * or a streaming sketch store). */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.agg(sum(expr("shiftleft(cast(1 as bigint), 53 - rho)")).as("s"))
      .select(expr(
        s"cast((cast(${AlphaE5 * HllM * HllM} as decimal(38,0)) * ${1L << 53}) " +
          "div (cast(s as decimal(38,0)) * 100000) as bigint)").as("n_est"))

  /**
   * Per-group HLL: distinct-token estimate vs exact for each value of
   * `groupCol` — the GROUP BY sketch shape (per-source vocabulary
   * size, per-domain URL cardinality…). One register-table shuffle
   * keyed `(group, reg)`, still `|groups|·m` cells after partial agg.
   */
  def hllDistinctBy(docs: DataFrame, groupCol: String): DataFrame = {
    val g = col(groupCol)
    val regs = docs.select(g, words.as("w"))
      .select(g, h60(col("w"), HllSeed).as("h"))
      .select(g, (col("h") % HllM).as("reg"), expr("h div 256").as("rest"))
      .select(g, col("reg"),
        when(col("rest") === 0L, lit(53))
          .otherwise(lit(53) - length(expr("bin(rest)"))).cast("int").as("rho"))
      .groupBy(g, col("reg")).agg(max(col("rho")).as("rho"))
    // absent registers contribute 2^53 each: add them arithmetically
    // (m - n_present regs at rho 0) instead of materializing the dense
    // group×m frame
    val est = regs.groupBy(g)
      .agg((sum(expr("shiftleft(cast(1 as bigint), 53 - rho)")) +
        (lit(HllM) - count(lit(1))) * (1L << 53)).as("s"))
      .select(g, expr(
        s"cast((cast(${AlphaE5 * HllM * HllM} as decimal(38,0)) * ${1L << 53}) " +
          "div (cast(s as decimal(38,0)) * 100000) as bigint)").as("n_est"))
    val exact = docs.select(g, words.as("w"))
      .groupBy(g).agg(count_distinct(col("w")).as("n_exact"))
    exact.join(est, Seq(groupCol))
      .select(g, col("n_exact"), col("n_est"))
  }

  /**
   * The Count-Min counter table: `(depth, bucket, cnt)` over token
   * OCCURRENCES — `d·w` cells (absent cells 0). Built from the
   * per-token frequency table (counters are additive, so hashing
   * distinct tokens weighted by their counts equals hashing every
   * occurrence — one corpus shuffle on the token key, then a
   * metadata-scale re-bucket).
   */
  def cmCounters(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val tf = docs.select(words.as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // hoist both md5-derived hashes ABOVE the depth explode: computed
    // once per distinct token instead of once per (token, depth) row —
    // 4× less hashing for identical values (the md5 is the dominant
    // cost of the build on a wide vocabulary)
    val cells = tf
      .select(col("cnt"), h60(col("w"), CmSeedBase).as("h1"),
        h60(col("w"), CmSeedBase + 1).as("h2"))
      .select(col("cnt"), col("h1"), col("h2"),
        explode(expr(s"sequence(0, ${CmDepth - 1})")).as("depth"))
      .select(col("depth"),
        (col("h1").bitwiseXOR(col("h2") * col("depth")) % CmWidth).as("bucket"),
        col("cnt"))
      .groupBy("depth", "bucket").agg(sum(col("cnt")).as("cnt"))
    spark.range(0, CmDepth).select(col("id").as("depth"))
      .crossJoin(spark.range(0, CmWidth).select(col("id").as("bucket")))
      .join(cells, Seq("depth", "bucket"), "left")
      .select(col("depth"), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /**
   * Heavy hitters through the sketch: the exact top-k tokens (ties by
   * token) with their true counts AND the Count-Min estimate
   * `min_i counter[i][h_i(w)]` — `(word, n_exact, n_est)`,
   * `n_est ≥ n_exact` always (CMS never underestimates a point
   * query). The counter table is broadcast; the probe is exchange-free
   * beyond the top-k itself.
   */
  def cmHeavyHitters(docs: DataFrame, k: Int): DataFrame =
    cmProbe(docs, cmCounters(docs), k)

  /**
   * Probe a GIVEN counter table (one [[cmCounters]] output, or any
   * element-wise SUM of several — the CM merge law) with the corpus's
   * exact top-k tokens: `(word, n_exact, n_est)`. Split out from
   * [[cmHeavyHitters]] so a streaming maintenance loop can merge its
   * per-batch partial counters and probe the merged sketch.
   */
  def cmProbe(docs: DataFrame, counters: DataFrame, k: Int): DataFrame = {
    val topk = docs.select(words.as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w")).limit(k)
    val probes = topk
      .select(col("w"), col("n_exact"),
        explode(expr(s"sequence(0, ${CmDepth - 1})")).as("depth"))
      .select(col("w"), col("n_exact"), col("depth"),
        (h60(col("w"), CmSeedBase).bitwiseXOR(h60(col("w"), CmSeedBase + 1) * col("depth"))
          % CmWidth).as("bucket"))
    probes.join(broadcast(counters), Seq("depth", "bucket"))
      .groupBy(col("w").as("word"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .select(col("word"), col("n_exact"), col("n_est"))
  }

  // ---- KMV (k-minimum-values / bottom-k) ---------------------------
  // The third mergeable-sketch axis: HLL answers |A|, Count-Min
  // answers freq(x), KMV answers both |A| AND |A∩B|/|A∪B| — the
  // corpus-overlap question (train/eval contamination audits, shard
  // vocabulary drift) that register sketches cannot, because the
  // sketch IS a uniform sample of the hash space (Bar-Yossef et al.
  // 2002; Beyer et al., SIGMOD 2007). Deterministic by construction:
  // the k smallest 60-bit hashes of the value set — no randomness, no
  // order dependence — and union-mergeable (merge = k smallest of the
  // concatenation), so shard sketches combine exactly like HLL's
  // register max / CMS's counter sum.

  /** KMV size k. */
  val KmvK = 256

  /** KMV hash seed (distinct from the HLL seed so the two sketches
    * sample independently). */
  val KmvSeed = 131

  /** The bottom-k sketch of the token vocabulary of `docs`:
    * `(rank, h)` — the k smallest distinct hashes, rank 1-based.
    * Scale shape: the distinct is a partial-agg-bounded vocabulary
    * rollup; the bottom-k is a TakeOrdered (per-partition k, then a
    * k-sized merge) — never a global sort. */
  def kmvSketch(docs: DataFrame): DataFrame =
    kmvOf(docs.select(words.as("w")))

  /** Bottom-k over an arbitrary one-column value frame. */
  private def kmvOf(values: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("h"))
    values
      // dedup the raw values FIRST (map-side partial distinct, so the
      // md5 runs once per distinct value, not once per occurrence)…
      .distinct()
      .select(h60(col(values.columns.head), KmvSeed).as("h"))
      // …then dedup hashes too, mirroring the oracle's
      // DISTINCT-of-hashes exactly (a hash collision between distinct
      // values must collapse to ONE sketch slot on both engines)
      .distinct()
      .orderBy(col("h")).limit(KmvK)
      // the window runs over k rows, not the corpus
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("h"))
  }

  /** Merge any number of `(rank, h)` sketch partials (a sketch log):
    * dedup by value, re-take the bottom-k, re-rank — exactly equals
    * the one-pass sketch of the union (every global bottom-k value is
    * in its own shard's bottom-k). */
  def kmvMerge(partials: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("h"))
    partials.select(col("h")).distinct()
      .orderBy(col("h")).limit(KmvK)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("h"))
  }

  /**
   * Distinct-count through the sketch next to the exact answer:
   * `(n_exact, n_est, err_bp)`. Estimator: `(k−1) · 2^60 / h_(k)`
   * (the classic unbiased KMV form), widened to DECIMAL(38,0) —
   * `(k−1)·2^60` exceeds a Long — so DuckDB's HUGEINT replay matches
   * to the last digit.
   */
  def kmvDistinct(docs: DataFrame): DataFrame = {
    val hk = kmvSketch(docs).agg(max(col("h")).as("hk"), count(lit(1)).as("kk"))
    val exact = docs.select(words.as("w"))
      .agg(count_distinct(col("w")).as("n_exact"))
    exact.crossJoin(broadcast(hk))
      .select(col("n_exact"),
        expr(s"cast(cast(kk - 1 as decimal(38,0)) * ${1L << 60} div cast(hk as decimal(38,0)) as bigint)")
          .as("n_est"))
      .select(col("n_exact"), col("n_est"),
        expr("abs(n_est - n_exact) * 10000 div n_exact").as("err_bp"))
  }

  /**
   * One-call corpus profiler — the pandas-profiling/Deequ "describe
   * this table" shape as a single long-format `(metric, value)`
   * report, composing the whole sketch family next to its exact
   * answers: row/token counts, vocabulary size (exact, HLL, KMV —
   * two independent estimator families as a standing cross-check),
   * the heaviest token through Count-Min, and the median document
   * length through the q-digest. Every value is an exact BIGINT the
   * oracle replays. Gate-scale composition (each part re-scans);
   * a production profiler would fuse the token passes over one
   * explode and memoize the leaf histogram — the parts themselves
   * are the already-scale-shaped operators above.
   */
  def profileDocs(docs: DataFrame): DataFrame = {
    def row1(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("metric"), col("value").cast("long").as("value"))
    val w = docs.select(words.as("w"))
    val hh = cmHeavyHitters(docs, 1)
    val dl = QuantileSketch.quantileProbe(
      docs.select(size(TextAnalysis.tokens(col("text"))).cast("long").as("len")), "len")
      .filter(col("phi_pct") === 50)
    Seq(
      row1("n_docs", docs.agg(count(lit(1)).as("value"))),
      row1("n_tokens", w.agg(count(lit(1)).as("value"))),
      row1("distinct_tokens_exact", w.agg(count_distinct(col("w")).as("value"))),
      row1("distinct_tokens_hll",
        hllEstimate(hllRegisters(docs)).select(col("n_est").as("value"))),
      row1("distinct_tokens_kmv",
        kmvDistinct(docs).select(col("n_est").as("value"))),
      row1("top_token_cnt_exact", hh.select(col("n_exact").as("value"))),
      row1("top_token_cnt_est", hh.select(col("n_est").as("value"))),
      row1("doclen_p50_exact", dl.select(col("v_exact").as("value"))),
      row1("doclen_p50_est", dl.select(col("v_est").as("value")))
    ).reduce(_.unionByName(_))
  }

  /**
   * The KMV merge law + Jaccard estimation, in one probe: sketch two
   * overlapping document subsets, merge by "k smallest of the union"
   * (what two shards of a corpus would ship), and estimate the token-
   * vocabulary Jaccard as |merged-k ∩ A ∩ B| / k — next to the exact
   * Jaccard. `(j_exact_e4, j_est_e4, n_inter)`; both sides exact
   * integer arithmetic in 1e-4 fixed point.
   */
  def kmvJaccard(docsA: DataFrame, docsB: DataFrame): DataFrame = {
    val a = kmvSketch(docsA).select(col("h").as("ha"))
    val b = kmvSketch(docsB).select(col("h").as("hb"))
    val merged = a.select(col("ha").as("h"))
      .union(b.select(col("hb").as("h"))).distinct()
      .orderBy(col("h")).limit(KmvK)
    val nInter = merged
      .join(broadcast(a), col("h") === col("ha"), "left_semi")
      .join(broadcast(b), col("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("n_inter"))
    val kUsed = merged.agg(count(lit(1)).as("k_used"))
    val va = docsA.select(words.as("w")).distinct()
    val vb = docsB.select(words.as("w")).distinct()
    val exact = va.join(vb.withColumnRenamed("w", "w2"),
        col("w") === col("w2"), "full")
      .agg(sum(when(col("w").isNotNull && col("w2").isNotNull, 1L)
          .otherwise(0L)).as("ni"),
        count(lit(1)).as("nu"))
      .select(expr("ni * 10000 div nu").as("j_exact_e4"))
    exact.crossJoin(broadcast(nInter)).crossJoin(broadcast(kUsed))
      .select(col("j_exact_e4"),
        expr("n_inter * 10000 div k_used").as("j_est_e4"),
        col("n_inter"))
  }
}
