package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Urls.parse(Seq((0L, url)).toDF("doc_id", "url"))
      .head().getAs[String]("canonical")

  test("canonicalization: authority case-folds, path case survives; " +
    "port/www/fragment strip; tracking params drop wherever they sit") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/B/") === "https://example.com/A/B")
    assert(canon("http://example.com/") === "http://example.com")
    assert(canon("http://example.com/p?utm_source=a&q=5&fbclid=z#f")
      === "http://example.com/p?q=5")
    assert(canon("http://example.com/p?utm_campaign=x") === "http://example.com/p")
    assert(canon("http://example.com/p?a=1&utm_medium=m&b=2")
      === "http://example.com/p?a=1&b=2")
    // non-URL input canonicalizes to empty, never throws
    assert(canon("not a url") === "")
  }

  test("host and registered domain: last-two-labels heuristic, port and " +
    "www ignored, deep subdomains collapse") {
    val rows = Urls.parse(Seq(
        (1L, "https://a.b.docs.example.co:8443/x"),
        (2L, "HTTP://WWW.SITE.ORG/y")).toDF("doc_id", "url"))
      .collect().map(x => (x.getAs[Long]("doc_id"),
        (x.getAs[String]("host"), x.getAs[String]("domain")))).toMap
    assert(rows(1L) === ("a.b.docs.example.co", "example.co"))
    assert(rows(2L) === ("site.org", "site.org"))
  }

  test("domainStats aggregates the edge list per registered domain") {
    val links = Seq(
      (1L, "https://a.example.com/x"),
      (1L, "https://b.example.com/x"),   // same canonical target domain
      (2L, "https://example.com/x"),
      (2L, "https://other.net/"),
      (3L, "no url")).toDF("doc_id", "href")
    val out = Urls.domainStats(links).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("example.com") === ((3L, 2L, 3L)))
    assert(out("other.net") === ((1L, 1L, 1L)))
    assert(!out.contains(""))
  }

  test("parse is exchange-free per-row work") {
    val plan = Urls.parse(
        spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
          .withColumn("url", expr(graft.HtmlQueries.UrlFixtureSql))
          .select("doc_id", "url"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
