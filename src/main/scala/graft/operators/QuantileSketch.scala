package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Mergeable rank/quantile sketch — the q-digest of Shrivastava,
 * Buragohain, Agrawal & Suri, "Medians and Beyond" (SenSys 2004):
 * the missing member of the [[Sketches]] family (HLL = distinct,
 * Count-Min = frequency, q-digest = rank). Reference capability
 * analog: the range-count pattern of `Index.java:144-164` generalized
 * from "how many rows in [a,b]" to "which value sits at rank r".
 *
 * WHY q-digest and not KLL/GK: KLL compacts with random coin flips
 * and GK is insertion-order-dependent — neither can be replayed
 * bit-exactly by an independent SQL oracle. The q-digest's compression
 * is a deterministic level-synchronous sweep over a bounded integer
 * universe: same input multiset → same digest, in any engine, which
 * is exactly what a dual-engine gate needs. The price is the
 * universe bound (here [[Universe]] = 2^16 leaf values — event cents)
 * and an ε = [[Levels]]/k rank-error factor instead of KLL's 1/k.
 *
 * Scale shape: the ONLY corpus-scale work is one partial-aggregatable
 * `groupBy(leaf).count` — the shuffle carries at most [[Universe]]
 * cells per partition regardless of corpus size (the CMS counter-table
 * bound, just wider). Compression then runs driver-side on that
 * UNIVERSE-BOUNDED histogram (≤ 2^16 cells — metadata scale, like the
 * memoized BPE merge table, NOT data scale) in exact Long arithmetic.
 * Two sketches merge by summing node counts and re-compressing with
 * the combined n — the merge law the split-merge gate pins.
 *
 * Error contract (asserted in the gates): every non-leaf digest node
 * holds ≤ τ = n/k mass (a push only fires when the merged mass fits
 * under τ), at most one node per level straddles a rank query, so a
 * quantile answered from the digest lands within [[Levels]]·τ ranks
 * of the target; a merged digest answers within
 * Levels·(τ_left + τ_right + τ_merged).
 */
object QuantileSketch {

  /** log2 of the leaf universe: values are ints in [0, 2^Levels). */
  val Levels = 16

  /** Universe size (leaf count). */
  val Universe: Int = 1 << Levels

  /** Compression parameter k: τ = max(1, n div k); digest carries
    * O(k) nodes and answers ranks within Levels·τ. */
  val K = 512

  /** A digest node: dyadic interval [idx·2^lvl, (idx+1)·2^lvl) with
    * its retained mass. */
  final case class Node(lvl: Int, idx: Long, cnt: Long) {
    def upper: Long = (idx + 1) * (1L << lvl) - 1
  }

  /**
   * The one corpus-scale pass: exact per-leaf histogram of `valueCol`
   * (must already be an integral value in [0, Universe)). Partial
   * aggregation bounds the shuffle at ≤ Universe cells per partition.
   */
  def leafCounts(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("leaf"))
      .groupBy("leaf").agg(count(lit(1)).as("cnt"))

  /** Collect a leaf histogram (≤ Universe rows — universe-bounded,
    * never data-bounded) into driver-side nodes at level 0. Enforces
    * the documented universe contract LOUDLY: a null leaf (null value
    * or non-castable input) or a leaf outside [0, Universe) fails with
    * a diagnostic instead of an NPE / silent wrong digest. */
  private def collectLeaves(lc: DataFrame): Seq[Node] =
    lc.collect().toSeq.map { r =>
      require(!r.isNullAt(0),
        "q-digest input contains a null leaf (null or non-castable value column); " +
          "filter or impute nulls before sketching")
      val leaf = r.getLong(0)
      require(leaf >= 0L && leaf < Universe,
        s"q-digest leaf $leaf outside universe [0, $Universe) — " +
          "rescale the value column into the sketch universe first")
      Node(0, leaf, r.getLong(1))
    }

  /**
   * Deterministic level-synchronous q-digest compression. Sweep
   * levels bottom-up; at level ℓ, group that level's nodes by parent:
   * if the siblings' mass plus any pre-existing parent mass fits
   * under τ, the children fold into the parent (which then competes
   * at level ℓ+1), else everything stays. Handles pre-existing mass
   * at ANY level, so the same routine compresses a fresh histogram
   * (all mass at leaves) and a merged pair of digests.
   */
  def compress(nodes: Seq[Node], tau: Long): Seq[Node] = {
    val m = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
    nodes.foreach(nd => m((nd.lvl, nd.idx)) = m.getOrElse((nd.lvl, nd.idx), 0L) + nd.cnt)
    var l = 0
    while (l < Levels) {
      val atL = m.keys.filter(_._1 == l).toSeq
      atL.groupBy { case (_, idx) => idx / 2 }.foreach { case (pidx, ks) =>
        val s = ks.map(m).sum
        val pc = m.getOrElse((l + 1, pidx), 0L)
        if (s + pc <= tau) {
          ks.foreach(m.remove)
          m((l + 1, pidx)) = pc + s
        }
      }
      l += 1
    }
    m.toSeq.map { case ((lvl, idx), cnt) => Node(lvl, idx, cnt) }
      .sortBy(nd => (nd.lvl, nd.idx))
  }

  /** τ for a given total mass. */
  def tauFor(n: Long): Long = math.max(1L, n / K)

  /**
   * Rank query over a digest: the canonical post-order scan — nodes
   * sorted by (upper bound asc, level asc), cumulative mass; the
   * estimate for target rank r is the upper bound of the first node
   * whose running mass reaches r.
   */
  def quantileAt(digest: Seq[Node], r: Long): Long = {
    var cum = 0L
    val ordered = digest.sortBy(nd => (nd.upper, nd.lvl))
    ordered.foreach { nd =>
      cum += nd.cnt
      if (cum >= r) return nd.upper
    }
    if (ordered.nonEmpty) ordered.last.upper else 0L
  }

  /** Exact rank helpers from the leaf histogram: value at rank r and
    * count-of-values ≤ v. */
  private def exactFromLeaves(leaves: Seq[Node]): (Long => Long, Long => Long) = {
    val sorted = leaves.sortBy(_.idx)
    val cums = sorted.scanLeft(0L)(_ + _.cnt).tail
    val valueAtRank = (r: Long) => {
      val i = cums.indexWhere(_ >= r)
      if (i < 0) sorted.last.idx else sorted(i).idx
    }
    val countLe = (v: Long) => {
      var s = 0L
      var i = 0
      while (i < sorted.length && sorted(i).idx <= v) { s += sorted(i).cnt; i += 1 }
      s
    }
    (valueAtRank, countLe)
  }

  private val digestSchema = StructType(Seq(
    StructField("lvl", IntegerType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  private val probeSchema = StructType(Seq(
    StructField("phi_pct", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("v_exact", LongType, nullable = false),
    StructField("v_est", LongType, nullable = false),
    StructField("rank_err", LongType, nullable = false),
    StructField("bound", LongType, nullable = false),
    StructField("within", BooleanType, nullable = false)))

  /** Quantile targets probed by the gates (percent). */
  val Phis: Seq[Int] = Seq(1, 5, 25, 50, 75, 95, 99)

  /** ceil(φ·n/100) — the rank-selection target both engines share. */
  def targetRank(phiPct: Int, n: Long): Long = (phiPct * n + 99L) / 100L

  /** The digest itself as a DataFrame `(lvl, idx, cnt)` — the
    * fixed-size mergeable state a pipeline would persist. */
  def digestTable(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val leaves = collectLeaves(leafCounts(df, valueCol))
    val n = leaves.map(_.cnt).sum
    val dg = compress(leaves, tauFor(n))
    spark.createDataFrame(
      spark.sparkContext.parallelize(dg.map(nd => Row(nd.lvl, nd.idx, nd.cnt)), 1),
      digestSchema)
  }

  private def probeRows(spark: SparkSession, dg: Seq[Node], leaves: Seq[Node],
      n: Long, bound: Long): DataFrame = {
    // empty corpus → empty report (no rank targets exist), not a crash
    // on the exact side's last-element access
    if (leaves.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], probeSchema)
    val (valueAtRank, countLe) = exactFromLeaves(leaves)
    val rows = Phis.map { phi =>
      val r = targetRank(phi, n)
      val vExact = valueAtRank(r)
      val vEst = quantileAt(dg, r)
      val err = math.abs(countLe(vEst) - r)
      Row(phi, n, vExact, vEst, err, bound, err <= bound)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), probeSchema)
  }

  /**
   * Build-and-probe: digest the corpus, answer [[Phis]], and report
   * each estimate next to the EXACT rank-selection answer with its
   * realized rank error and the Levels·τ contract — the standing
   * accuracy probe the HLL/CMS gates also carry.
   */
  def quantileProbe(df: DataFrame, valueCol: String): DataFrame =
    probeLeafCounts(leafCounts(df, valueCol))

  /** Build-and-probe from an already-aggregated `(leaf, cnt)` table —
    * the read side of any leaf-histogram log (one [[leafCounts]]
    * output, or the element-wise SUM of several: leaf counts are the
    * sketch's additive partial state, so a streaming maintenance loop
    * sums its per-batch partials and probes the merged histogram —
    * and the result is IDENTICAL to the one-pass batch build, which
    * is the gated merge law). */
  def probeLeafCounts(lc: DataFrame): DataFrame = {
    val spark = lc.sparkSession
    val leaves = collectLeaves(lc)
    val n = leaves.map(_.cnt).sum
    val tau = tauFor(n)
    val dg = compress(leaves, tau)
    probeRows(spark, dg, leaves, n, Levels.toLong * tau)
  }

  /**
   * Range-count estimation through the digest — the reference's
   * `count(rect)` (`Index.java:144-164` capability) answered from
   * fixed-size sketch state instead of a scan: est|{x ∈ [lo, hi]}| =
   * estLe(hi) − estLe(lo−1), where estLe assigns each digest node's
   * mass to its upper bound. Each endpoint contributes ≤ Levels·τ
   * straddle error, so the gate pins |est − exact| ≤ 2·Levels·τ.
   * Output: `(lo, hi, n_exact, n_est, rank_err, bound, within)`.
   */
  def rangeCountProbe(df: DataFrame, valueCol: String,
      ranges: Seq[(Long, Long)]): DataFrame = {
    ranges.foreach { case (lo, hi) =>
      require(lo <= hi, s"inverted range [$lo, $hi]") }
    val spark = df.sparkSession
    val leaves = collectLeaves(leafCounts(df, valueCol))
    val n = leaves.map(_.cnt).sum
    val tau = tauFor(n)
    val dg = compress(leaves, tau)
    val (_, countLe) = exactFromLeaves(leaves)
    def estLe(v: Long): Long = dg.filter(_.upper <= v).map(_.cnt).sum
    val bound = 2L * Levels * tau
    val rows = ranges.map { case (lo, hi) =>
      val est = estLe(hi) - estLe(lo - 1)
      val exact = countLe(hi) - countLe(lo - 1)
      val err = math.abs(est - exact)
      Row(lo, hi, exact, est, err, bound, err <= bound)
    }
    val schema = StructType(Seq(
      StructField("lo", LongType, nullable = false),
      StructField("hi", LongType, nullable = false),
      StructField("n_exact", LongType, nullable = false),
      StructField("n_est", LongType, nullable = false),
      StructField("rank_err", LongType, nullable = false),
      StructField("bound", LongType, nullable = false),
      StructField("within", BooleanType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /**
   * Per-group build-and-probe — the GROUP BY sketch shape (per-type
   * latency percentiles, per-source length distributions): one
   * `(group, leaf)`-keyed corpus shuffle (≤ |groups|·Universe cells
   * after partial agg), then each group's digest compresses and
   * probes independently under its own τ = n_g/k. Output adds the
   * group column ahead of the [[quantileProbe]] columns.
   */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val lc = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("leaf"))
      .groupBy("g", "leaf").agg(count(lit(1)).as("cnt"))
      .collect().toSeq.groupBy(_.getString(0))
    val rows = lc.toSeq.sortBy(_._1).flatMap { case (g, rs) =>
      val leaves = rs.map(r => Node(0, r.getLong(1), r.getLong(2)))
      val n = leaves.map(_.cnt).sum
      val tau = tauFor(n)
      val dg = compress(leaves, tau)
      val bound = Levels.toLong * tau
      val (valueAtRank, countLe) = exactFromLeaves(leaves)
      Phis.map { phi =>
        val r = targetRank(phi, n)
        val vEst = quantileAt(dg, r)
        val err = math.abs(countLe(vEst) - r)
        Row(g, phi, n, valueAtRank(r), vEst, err, bound, err <= bound)
      }
    }
    val schema = StructType(
      StructField("g", StringType, nullable = false) +: probeSchema.fields.toSeq)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /**
   * The merge law, gated: split the corpus by `splitCol % 2`, digest
   * each half independently (what two shards of a 100 TB corpus would
   * ship), merge by summing node counts and re-compressing under the
   * combined τ, then probe the MERGED digest against the full corpus's
   * exact quantiles. Bound: Levels·(τ_left + τ_right + τ_merged) —
   * each half contributes its own ≤-τ_half straddle mass per level
   * before the merge compression adds its own.
   */
  def mergeProbe(df: DataFrame, valueCol: String, splitCol: String): DataFrame = {
    val spark = df.sparkSession
    // pmod, not %: Spark's % preserves sign, so a negative split key
    // would land in "half" -1 and silently vanish from both the merged
    // digest and the exact baseline
    val withHalf = df.select(col(valueCol).cast("long").as("leaf"),
      pmod(col(splitCol), lit(2)).cast("int").as("half"))
    val halves = withHalf.groupBy("half", "leaf").agg(count(lit(1)).as("cnt"))
      .collect().toSeq
      .groupBy(_.getInt(0))
      .view.mapValues(_.map(r => Node(0, r.getLong(1), r.getLong(2)))).toMap
    val left = halves.getOrElse(0, Seq.empty)
    val right = halves.getOrElse(1, Seq.empty)
    val (n1, n2) = (left.map(_.cnt).sum, right.map(_.cnt).sum)
    val n = n1 + n2
    val (tau1, tau2, tauM) = (tauFor(n1), tauFor(n2), tauFor(n))
    val merged = compress(compress(left, tau1) ++ compress(right, tau2), tauM)
    val allLeaves = (left ++ right).groupBy(_.idx)
      .map { case (idx, ns) => Node(0, idx, ns.map(_.cnt).sum) }.toSeq
    probeRows(spark, merged, allLeaves, n, Levels.toLong * (tau1 + tau2 + tauM))
  }
}
