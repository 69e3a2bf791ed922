package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String): (String, String, Long) = {
    val r = Html.extract(Seq((0L, html)).toDF("doc_id", "html")).head()
    (r.getAs[String]("title"), r.getAs[String]("text"), r.getAs[Long]("n_links"))
  }

  test("extract: blocks vanish with their content, tags become word " +
    "boundaries, entities decode, whitespace squeezes") {
    val (title, text, nLinks) = extractOne(
      "<html><head><title>T1</title><style>body { margin: 0; }</style></head>" +
        "<body><!-- note --><h1>Hello</h1><p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>" +
        "<script>var n = 2 > 1;</script><a href=\"https://x.example/\">x</a></body></html>")
    assert(title === "T1")
    assert(text === "T1 Hello a & b <tag> \"q\" 's' x")
    assert(nLinks === 1L)
  }

  test("entity decode order: &amp;lt; is the LITERAL string &lt;, not <") {
    val (_, text, _) = extractOne("<p>&amp;lt;</p>")
    assert(text === "&lt;")
  }

  test("degenerate pages: no title -> empty string, no links -> 0, " +
    "tag-free text passes through trimmed") {
    val (title, text, nLinks) = extractOne("  plain words only  ")
    assert(title === "")
    assert(text === "plain words only")
    assert(nLinks === 0L)
  }

  test("links: one row per href occurrence, duplicates preserved, " +
    "document order within a page") {
    val out = Html.links(Seq(
      (1L, "<a href=\"https://a/\">1</a><a href=\"https://b/\">2</a><a href=\"https://a/\">3</a>"),
      (2L, "no links here")).toDF("doc_id", "html"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "https://a/"), (1L, "https://b/"), (1L, "https://a/")))
  }

  test("extraction plan is a single codegen'd project over the scan — " +
    "no shuffle, no UDFs") {
    val df = Html.extract(
      spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
        .withColumn("html", expr(graft.HtmlQueries.FixtureHtmlSql))
        .select("doc_id", "html"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // "*(1)" prefixes every operator inside whole-stage-codegen span 1
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
