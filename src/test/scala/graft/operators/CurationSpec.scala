package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("id_a", "id_b")

  test("connectedComponents labels chains, cliques and isolated pairs with the component minimum") {
    // chain 1-2-3-4 (diameter 3 → needs >1 propagation round),
    // triangle 10-11-12, isolated pair 20-21
    val cc = Dedup.connectedComponents(
        edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents handles a long chain within the iteration budget") {
    // path 0-1-...-19: worst-case diameter for min propagation
    val path = (0L until 19L).map(i => (i, i + 1))
    val cc = Dedup.connectedComponents(edges(path: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 20 && cc.values.forall(_ == 0L))
  }

  test("clusters merge transitively where pairwise loser-deletion would under-delete") {
    // a~b and b~c are near-dups, a~c may not pair directly — the cluster
    // must still be {a,b,c} with one keeper
    val words = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, words),                              // a
      (2L, words + " extraone"),                // b ≈ a
      (3L, words + " extraone extratwo"),       // c ≈ b
      (9L, (1 to 60).map(i => s"other$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val cl = Dedup.clusters(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.keySet == Set(1L, 2L, 3L))
    assert(cl.values.toSet == Set(1L))
    val keep = Dedup.keepers(docs).collect().map(_.getLong(0)).toSet
    assert(keep == Set(1L, 9L))
  }

  test("redactPii replaces emails and digit runs, counts without double-counting") {
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@ex-ample.co.uk or call 5551234567 now"),
      (2L, "ids 12345678 and 999888777666 but not 123456"),
      (3L, "clean text with short 42 numbers")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, "contact me at <EMAIL> or call <NUM> now")))
    // the email's own digits must not count as a digit run
    assert(out(2L) == ((0L, 2L, "ids <NUM> and <NUM> but not 123456")))
    assert(out(3L) == ((0L, 0L, "clean text with short 42 numbers")))
  }

  test("repetitionStats scores degenerate repetition near 1000 and unique text at 0") {
    val docs = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "v w x y z"),          // all bigrams distinct
      (3L, "single")              // <2 tokens → dropped
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((5L, 2L, 600L)), 2L -> ((4L, 4L, 0L))))
  }

  test("stratifiedSample is deterministic, respects strata rates, and uses the default rate") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val rates = Map("en" -> 100, "de" -> 300, "fr" -> 500)
    val s1 = Curation.stratifiedSample(docs, "lang", rates, 400)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Curation.stratifiedSample(docs, "lang", rates, 400)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.nonEmpty)
    // rate-0 stratum drops everything from it; rate-1000 keeps everything
    val all = Curation.stratifiedSample(docs, "lang", Map.empty, 1000).count()
    assert(all == docs.count())
    val none = Curation.stratifiedSample(docs, "lang", Map.empty, 0).count()
    assert(none == 0)
    // sampled fraction of the default-rate strata is near 40%
    val zh = docs.filter(col("lang") === "zh").count()
    val zhKept = Curation.stratifiedSample(docs, "lang", rates, 400)
      .filter(col("lang") === "zh").count()
    assert(math.abs(zhKept.toDouble / zh - 0.4) < 0.15,
      s"zh kept $zhKept of $zh")
  }

  test("sourceCap keeps exactly the n lowest doc_ids per source") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val out = Curation.sourceCap(docs, 3).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val bySource = out.groupBy(_._1)
    assert(bySource.values.forall(_.length == 3)) // every source has ≥3 docs at sf0.01
    val expected = docs.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (s, rows) => s -> rows.map(_._2).sorted.take(3).toSeq }
    bySource.foreach { case (s, rows) =>
      assert(rows.sortBy(_._3).map(_._2).toSeq == expected(s))
    }
  }

  test("tokenHistogram buckets cover the corpus exactly once") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val hist = Curation.tokenHistogram(docs, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(_._2).sum == docs.count())
    val totalTokens = TextAnalysis.stats(docs).agg(sum("n_tokens")).head.getLong(0)
    assert(hist.map(_._3).sum == totalTokens)
    assert(hist.forall { case (b, _, _) => b % 25 == 0 })
  }
}
