package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * URL normalization and domain analytics — the curation stage between
 * link extraction and per-domain policy (domain caps, blocklists,
 * crawl-frontier dedup all key on a CANONICAL url/domain, never the
 * raw href: `HTTPS://WWW.Example.COM:443/a/` and
 * `https://example.com/a` must collapse).
 *
 * Same dialect discipline as [[Html]]: one generator per expression,
 * consumed by both engines; patterns avoid backslash classes (`[.]`
 * instead of `\.`) and stay in the shared deterministic regex subset.
 * All pure per-row column work — codegen'd, shuffle-free; the
 * aggregates ([[domainStats]]) shuffle once on the domain key.
 *
 * Canonicalization is the standard heuristic chain (lowercase scheme +
 * host, strip default port, strip `www.`, strip fragment, strip
 * tracking params, collapse the trailing slash); registered-domain is
 * the last-two-labels heuristic (a full public-suffix list is a data
 * file, not an algorithm — the seam is this expression).
 */
object Urls {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private def rr(col: String, pattern: String, rep: String,
                 duck: Boolean): String =
    if (duck) s"regexp_replace($col, ${q(pattern)}, ${q(rep)}, 'g')"
    else s"regexp_replace($col, ${q(pattern)}, ${q(rep)})"

  /** Hostname of a URL (no scheme/port/path), lowercased. */
  def hostSql(col: String, duck: Boolean): String = {
    val authority = s"regexp_extract(lower($col), '^[a-z]+://([^/?#]+)', 1)"
    rr(rr(authority, ":[0-9]+$", "", duck), "^www[.]", "", duck)
  }

  /** Registered domain (last-two-labels heuristic) of [[hostSql]]. */
  def domainSql(col: String, duck: Boolean): String =
    s"regexp_extract(${hostSql(col, duck)}, '([^.]+[.][^.]+)$$', 1)"

  /** Path component ('' when absent), query/fragment excluded. */
  def pathSql(col: String): String =
    s"regexp_extract($col, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1)"

  /** Capture-group backreference, per dialect: Java/Spark `$1`,
    * RE2/DuckDB `\1`. */
  private def gref(i: Int, duck: Boolean): String =
    if (duck) "\\" + i else "$" + i

  /**
   * Canonical URL: scheme+authority lowercased (the case-insensitive
   * parts — path/query case is PRESERVED), explicit port and `www.`
   * stripped, `utm_*`/`fbclid` tracking params dropped (each keeps its
   * own delimiter, then delimiter runs collapse and a trailing `?`/`&`
   * strips — so surviving params stay intact wherever the dropped one
   * sat), fragment dropped, trailing slash collapsed (root kept bare:
   * the authority IS the page).
   */
  def canonicalSql(col: String, duck: Boolean): String = {
    val auth0 = s"lower(regexp_extract($col, '^([a-zA-Z]+://[^/?#]+)', 1))"
    val auth = rr(rr(auth0, ":[0-9]+$", "", duck),
      "^([a-z]+://)www[.]", gref(1, duck), duck)
    val rest0 = s"regexp_extract($col, '^[a-zA-Z]+://[^/?#]+(.*)$$', 1)"
    val noFrag = rr(rest0, "#.*$", "", duck)
    val noTrack = rr(noFrag, "([?&])(utm_[^&#=]*|fbclid)(=[^&#]*)?",
      gref(1, duck), duck)
    val fixed = rr(rr(noTrack, "([?&])[?&]+", gref(1, duck), duck),
      "[?&]$", "", duck)
    s"concat($auth, ${rr(fixed, "/$", "", duck)})"
  }

  /** Parse a url column into canonical + host + registered domain +
    * path — per-row, exchange-free. */
  def parse(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("canonical", expr(canonicalSql(urlCol, duck = false)))
      .withColumn("host", expr(hostSql(urlCol, duck = false)))
      .withColumn("domain", expr(domainSql(urlCol, duck = false)))
      .withColumn("path", expr(pathSql(urlCol)))

  /**
   * Per-domain link analytics over an `(doc_id, href)` edge list (the
   * [[Html.links]] output): total links, distinct linking documents,
   * distinct canonical targets. One shuffle on the domain key; the
   * distincts are partial-aggregated per mapper first.
   */
  def domainStats(links: DataFrame, hrefCol: String = "href"): DataFrame =
    links
      .select(col("doc_id"),
        expr(domainSql(hrefCol, duck = false)).as("domain"),
        expr(canonicalSql(hrefCol, duck = false)).as("canonical"))
      .filter(col("domain") =!= "")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("canonical")).as("n_targets"))
}
