package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/**
 * Corpus-curation query inventory over `documents`: repetition scoring,
 * PII redaction, deterministic stratified sampling, per-source caps,
 * and the corpus length histogram. All determinism is integer/md5-based
 * so every query — including the "random" sample — is hash-match gated
 * against the DuckDB oracle.
 */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  // stratified-sample operating point: downsample dominant English hard,
  // mid-range de/fr explicitly, let es/zh take the default — exercising
  // both the explicit-rate and the fallback path of the rate map
  private val SampleRates = Map("en" -> 100, "de" -> 300, "fr" -> 500)
  private val SampleDefault = 400
  private val SourceCapN = 10
  private val HistBucket = 25

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "repetition_stats" -> ((s, dir) => Curation.repetitionStats(docs(s, dir))),
    "pii_redact" -> ((s, dir) => Curation.redactPii(docs(s, dir))),
    "sample_stratified" -> ((s, dir) =>
      Curation.stratifiedSample(docs(s, dir), "lang", SampleRates, SampleDefault)
        .select("doc_id", "lang")),
    "source_cap" -> ((s, dir) => Curation.sourceCap(docs(s, dir), SourceCapN)),
    "token_histogram" -> ((s, dir) => Curation.tokenHistogram(docs(s, dir), HistBucket))
  )

  // regexes are RE2-compatible by construction (Curation scaladoc), so
  // the same pattern string drops into both engines verbatim
  private val Em = Curation.EmailRe
  private val Dg = Curation.DigitRunRe

  val oracle: Map[String, String] = Map(
    "repetition_stats" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
b AS (SELECT doc_id, list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1]) AS bg
      FROM w WHERE len(ws) >= 2)
SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
  CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
  CAST(((len(bg) - len(list_distinct(bg))) * 1000) // len(bg) AS BIGINT) AS rep_e3
FROM b""",

    "pii_redact" ->
      s"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '$Em')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(regexp_replace(text, '$Em', '<EMAIL>', 'g'), '$Dg')) AS BIGINT) AS n_digit_runs,
  regexp_replace(regexp_replace(text, '$Em', '<EMAIL>', 'g'), '$Dg', '<NUM>', 'g') AS redacted
FROM documents""",

    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
WHERE CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 <
  CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 300 WHEN 'fr' THEN 500 ELSE 400 END""",

    "source_cap" ->
      """SELECT doc_id, source, rn FROM (
  SELECT doc_id, source,
    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
  FROM documents)
WHERE rn <= 10""",

    "token_histogram" ->
      """WITH s AS (SELECT len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens FROM documents)
SELECT CAST((n_tokens // 25) * 25 AS BIGINT) AS bucket,
  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
FROM s GROUP BY 1"""
  )
}
