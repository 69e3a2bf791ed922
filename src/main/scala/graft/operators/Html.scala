package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HTML text extraction — the ingest stage every web-scale training
 * corpus starts with (WET-style extraction: CommonCrawl, C4, CCNet all
 * begin by reducing markup to visible text). Pure declarative column
 * work: one regex pass per structural element class, a fixed entity
 * table, and a whitespace squeeze — all codegen'd `regexp_replace` /
 * `replace` chains, no UDFs, fully parallel and shuffle-free.
 *
 * Dialect discipline (the [[Dedup.spanGramHash]] pattern): every regex
 * and every replacement below is emitted by ONE generator consumed by
 * both the Spark engine and the DuckDB oracle, so the gate pins
 * bit-identical extraction. The only dialect difference is DuckDB's
 * explicit `'g'` flag (Spark's `regexp_replace` is global by default).
 * Patterns deliberately avoid backslash classes (`\s`) — Spark string
 * literals process backslash escapes, DuckDB's do not — and avoid
 * non-greedy/DOTALL forms by matching `[^<]*` block bodies instead
 * (requires `<`-free script/style/comment bodies; real-world content
 * violating that degrades to over-stripping a block early, never to an
 * error).
 *
 * Scale shape: per-row string work over the text column only — the
 * plan is a single WholeStageCodegen project over the scan, filters
 * and column pruning push through it untouched.
 */
object Html {

  /** Structural blocks whose CONTENT must vanish (not just the tags):
    * script, style, comments. `[^<]*` bodies keep both regex engines in
    * the same deterministic subset (no DOTALL, no laziness). */
  private val BlockPatterns = Seq(
    "<script[^>]*>[^<]*</script>",
    "<style[^>]*>[^<]*</style>",
    "<!--[^-]*-->")

  /** Any remaining tag becomes a space (word boundary, matching how
    * block-level markup renders). */
  private val TagPattern = "<[^>]*>"

  /** Minimal entity table, decoded in this order — `&amp;` LAST so
    * `&amp;lt;` decodes to the literal `&lt;` and not to `<`. */
  private val Entities = Seq(
    "&quot;" -> "\"", "&#39;" -> "'", "&lt;" -> "<", "&gt;" -> ">",
    "&amp;" -> "&")

  /** `href="…"` target extraction (group 1). */
  private val HrefPattern = "href=\"([^\"]*)\""

  /** `<title>` body (group 1; `[^<]*` body — titles are text-only). */
  private val TitlePattern = "<title[^>]*>([^<]*)</title>"

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `regexp_replace` with the global flag spelled per dialect. */
  private def rr(col: String, pattern: String, rep: String,
                 duck: Boolean): String =
    if (duck) s"regexp_replace($col, ${q(pattern)}, ${q(rep)}, 'g')"
    else s"regexp_replace($col, ${q(pattern)}, ${q(rep)})"

  /**
   * The full visible-text extraction expression over `col`: block
   * removal → tag strip → entity decode → space squeeze → trim.
   * `duck = false` emits Spark SQL, `true` the DuckDB twin — same
   * constants, same order, bit-identical output.
   */
  def stripSql(col: String, duck: Boolean): String = {
    val blocksGone = BlockPatterns.foldLeft(col)((c, p) => rr(c, p, " ", duck))
    val tagsGone = rr(blocksGone, TagPattern, " ", duck)
    val decoded = Entities.foldLeft(tagsGone) { case (c, (e, ch)) =>
      s"replace($c, ${q(e)}, ${q(ch)})"
    }
    s"trim(${rr(decoded, "  +", " ", duck)})"
  }

  /** Title extraction expression (empty string when absent — both
    * engines return '' for a non-matching `regexp_extract`). */
  def titleSql(col: String): String =
    s"regexp_extract($col, ${q(TitlePattern)}, 1)"

  /** Link-target list expression (`href` values, document order). */
  def linksSql(col: String): String =
    s"regexp_extract_all($col, ${q(HrefPattern)}, 1)"

  /** Visible text + title + link count per document. The html column
    * is pruned immediately after extraction — downstream stages carry
    * only the derived columns. */
  def extract(df: DataFrame, htmlCol: String = "html"): DataFrame =
    df.withColumn("title", expr(titleSql(htmlCol)))
      .withColumn("text", expr(stripSql(htmlCol, duck = false)))
      .withColumn("n_links",
        size(expr(linksSql(htmlCol))).cast("long"))
      .drop(htmlCol)

  /** One row per outbound link: `(doc_id, href)` — the edge list
    * URL-level dedup and domain-cap curation start from. */
  def links(df: DataFrame, htmlCol: String = "html"): DataFrame =
    df.select(col("doc_id"),
      explode(expr(linksSql(htmlCol))).as("href"))
}
