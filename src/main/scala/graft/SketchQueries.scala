package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/**
 * Sketch gates: HyperLogLog distinct counting and Count-Min heavy
 * hitters over the `documents` vocabulary ([[graft.operators.Sketches]]).
 * Every estimate is exact integer arithmetic over the dialect-shared
 * md5 hash, so the DuckDB oracle replays registers, counters, and the
 * final estimates bit-identically; the gates also carry the exact
 * answers, making each one a standing accuracy probe.
 */
object SketchQueries {

  /**
   * Vocabulary-widening fixture: the driver corpus is ~31 near-universal
   * terms — fine for frequency sketches' heavy hitters but DEGENERATE
   * for distinct counting (n ≪ m puts raw HLL in its known
   * small-range-bias regime, where production implementations switch
   * to linear counting — which needs a float `ln` both engines would
   * have to agree on bit-for-bit). Append 40 per-document unique
   * tokens (`u<doc_id>_<i>`) with one dialect-shared expression, so
   * corpus and per-source vocabularies land in the raw estimator's
   * valid regime (n ≳ 2.5·m) and the accuracy columns mean something.
   */
  private[graft] val AugSql: String =
    "text" + (0 until 40).map(i => s" || ' u' || doc_id || '_$i'").mkString

  /** [[AugSql]] as an oracle CTE named `sdocs`. */
  private val sdocsCte =
    s"sdocs AS (SELECT doc_id, source, $AugSql AS text FROM documents)"

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .withColumn("text", expr(AugSql))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the m=256 HLL register table (reg, max-rho) — the fixed-size,
    // element-wise-max-mergeable distinct-count state
    "hll_registers" -> ((s, dir) => Sketches.hllRegisters(docs(s, dir))),
    // raw-estimator distinct tokens vs exact: (n_exact, n_est, err_bp);
    // the register sum is scaled to exact BIGINTs, the division widened
    // to DECIMAL(38,0) — engine and oracle agree to the last digit
    "hll_distinct" -> ((s, dir) => Sketches.hllDistinct(docs(s, dir))),
    // per-source vocabulary size through the same registers — the
    // GROUP BY sketch shape (one (source, reg)-keyed shuffle)
    "hll_by_source" -> ((s, dir) => Sketches.hllDistinctBy(docs(s, dir), "source")),
    // the d=4 × w=512 Count-Min counter table over token occurrences —
    // the fixed-size, element-wise-sum-mergeable frequency state
    "cms_counters" -> ((s, dir) => Sketches.cmCounters(docs(s, dir))),
    // exact top-20 tokens with their Count-Min point estimates:
    // (word, n_exact, n_est), n_est >= n_exact by construction
    "cms_heavy_hitters" -> ((s, dir) => Sketches.cmHeavyHitters(docs(s, dir), 20))
  )

  import Sketches.{HllM, AlphaE5, CmDepth, CmWidth, HllSeed, CmSeedBase}

  /** Oracle twin of Sketches.h60. */
  private def oh60(e: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed:' || $e), 1, 15)) AS BIGINT)"

  /** Shared register CTE: words → (reg, rho) → m-dense register table. */
  private[graft] val regCte =
    s"""$sdocsCte,
w AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM sdocs),
hh AS (SELECT ${oh60("w", HllSeed)} AS h FROM w),
rr AS (SELECT h % $HllM AS reg, h // 256 AS rest FROM hh),
rho AS (SELECT reg, CASE WHEN rest = 0 THEN 53 ELSE 53 - len(bin(rest)) END AS rho FROM rr),
pres AS (SELECT reg, max(rho) AS rho FROM rho GROUP BY reg),
regs AS (SELECT t.range AS reg, coalesce(p.rho, 0) AS rho
  FROM range(0, $HllM) t LEFT JOIN pres p ON p.reg = t.range)"""

  /** Shared CMS CTEs: token frequencies and the dense counter table. */
  private val cmsCte =
    s"""$sdocsCte,
w AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM sdocs),
tf AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY w),
cells AS (SELECT t.range AS depth,
    xor(${oh60("w", CmSeedBase)}, ${oh60("w", CmSeedBase + 1)} * t.range) % $CmWidth AS bucket,
    sum(cnt) AS cnt
  FROM tf, range(0, $CmDepth) t GROUP BY 1, 2),
counters AS (SELECT d.range AS depth, b.range AS bucket, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
  FROM range(0, $CmDepth) d CROSS JOIN range(0, $CmWidth) b
  LEFT JOIN cells c ON c.depth = d.range AND c.bucket = b.range)"""

  /** The exact-integer HLL estimate over a register relation exposing
    * per-group `(s)` = Σ 2^(53−rho). */
  private[graft] val estExpr =
    s"CAST((CAST(${AlphaE5 * HllM * HllM} AS HUGEINT) * ${1L << 53}) // (CAST(s AS HUGEINT) * 100000) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "hll_registers" ->
      s"""WITH $regCte
SELECT CAST(reg AS BIGINT) AS reg, CAST(rho AS INT) AS rho FROM regs""",

    "hll_distinct" ->
      s"""WITH $regCte,
sm AS (SELECT sum(CAST(1 AS BIGINT) << (53 - rho)) AS s FROM regs),
est AS (SELECT $estExpr AS n_est FROM sm),
ex AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS n_exact FROM w)
SELECT ex.n_exact, est.n_est,
  abs(est.n_est - ex.n_exact) * 10000 // ex.n_exact AS err_bp
FROM ex, est""",

    "hll_by_source" ->
      s"""WITH $sdocsCte,
w AS (SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w FROM sdocs),
hh AS (SELECT source, ${oh60("w", HllSeed)} AS h FROM w),
rr AS (SELECT source, h % $HllM AS reg, h // 256 AS rest FROM hh),
rho AS (SELECT source, reg, CASE WHEN rest = 0 THEN 53 ELSE 53 - len(bin(rest)) END AS rho FROM rr),
pres AS (SELECT source, reg, max(rho) AS rho FROM rho GROUP BY source, reg),
sm AS (SELECT source,
    sum(CAST(1 AS BIGINT) << (53 - rho)) + ($HllM - count(*)) * (CAST(1 AS BIGINT) << 53) AS s
  FROM pres GROUP BY source),
est AS (SELECT source, $estExpr AS n_est FROM sm),
ex AS (SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS n_exact FROM w GROUP BY source)
SELECT ex.source, ex.n_exact, est.n_est FROM ex JOIN est ON est.source = ex.source""",

    "cms_counters" ->
      s"""WITH $cmsCte
SELECT CAST(depth AS BIGINT) AS depth, CAST(bucket AS BIGINT) AS bucket, cnt FROM counters""",

    "cms_heavy_hitters" ->
      s"""WITH $cmsCte,
topk AS (SELECT w, cnt AS n_exact FROM tf ORDER BY cnt DESC, w LIMIT 20),
probes AS (SELECT w, n_exact, t.range AS depth,
    xor(${oh60("w", CmSeedBase)}, ${oh60("w", CmSeedBase + 1)} * t.range) % $CmWidth AS bucket
  FROM topk, range(0, $CmDepth) t)
SELECT p.w AS word, p.n_exact, min(c.cnt) AS n_est
FROM probes p JOIN counters c ON c.depth = p.depth AND c.bucket = p.bucket
GROUP BY p.w, p.n_exact"""
  )
}
