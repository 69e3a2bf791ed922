package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with a known skewed frequency profile: token "t<i>" appears
  // in documents i, i+1, …  → token t0 everywhere, tails rare
  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, (0 to i % 7).map(j => s"t$j w${i}x").mkString(" "), s"s${i % 3}"))
    .toDF("doc_id", "text", "source")

  test("HLL registers: dense m rows, rho in [0, 53], partitioning-independent") {
    val d = corpus(200)
    val r = Sketches.hllRegisters(d).collect().map(x => (x.getLong(0), x.getInt(1)))
    assert(r.length === Sketches.HllM)
    assert(r.map(_._1).toSet === (0L until Sketches.HllM.toLong).toSet)
    assert(r.forall { case (_, rho) => rho >= 0 && rho <= 53 })
    val r2 = Sketches.hllRegisters(d.repartition(7)).collect()
      .map(x => (x.getLong(0), x.getInt(1)))
    assert(r.toSet === r2.toSet)
  }

  test("HLL registers merge by element-wise max (the cross-shard union law)") {
    val a = corpus(120); val b = corpus(260).filter(col("doc_id") >= 100)
    val whole = Sketches.hllRegisters(a.unionByName(b.filter(col("doc_id") >= 120)))
      .collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    val ra = Sketches.hllRegisters(a).collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    val rb = Sketches.hllRegisters(b).collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    // b overlaps a on docs 100-119: max-merge still equals the union's
    // registers because max is idempotent over duplicates
    val merged = ra.map { case (k, v) => k -> math.max(v, rb(k)) }
    assert(merged === whole)
  }

  test("HLL estimate lands within the expected error band of exact") {
    val row = Sketches.hllDistinct(corpus(3000)).head()
    val (exact, est, errBp) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(exact > 2500L, exact.toString) // ~3000 unique w<i>x tokens + t0..t6
    // raw estimator at m=256: standard error ~6.5%; allow 4 sigma
    assert(errBp < 2600L, s"exact=$exact est=$est err_bp=$errBp")
    assert(errBp === math.abs(est - exact) * 10000 / exact)
  }

  test("per-group HLL tracks per-source vocabularies") {
    val r = Sketches.hllDistinctBy(corpus(3000), "source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toList
    assert(r.map(_._1).toSet === Set("s0", "s1", "s2"))
    r.foreach { case (src, exact, est) =>
      val err = math.abs(est - exact) * 10000 / exact
      assert(err < 2600L, s"$src exact=$exact est=$est")
    }
  }

  test("CMS counters: dense d×w, column sums all equal total occurrences") {
    val d = corpus(500)
    val c = Sketches.cmCounters(d).collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(c.length === Sketches.CmDepth * Sketches.CmWidth)
    val total = d.select(explode(split(lower(trim(col("text"))), "\\s+")).as("w")).count()
    val perDepth = c.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDepth.values.toSet === Set(total),
      s"total=$total perDepth=$perDepth")
  }

  test("CMS point estimates never underestimate and are tight for heavy keys") {
    val hh = Sketches.cmHeavyHitters(corpus(800), 10).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(hh.length === 10)
    hh.foreach { case (w, exact, est) =>
      assert(est >= exact, s"$w est=$est < exact=$exact")
      // error bound εN with ε = e/w over ~3200 occurrences: generous cap
      assert(est - exact <= 64L, s"$w est=$est exact=$exact")
    }
    // the universally-present token is the top hitter
    assert(hh.maxBy(_._2)._1 === "t0")
  }

  test("KMV sketch: k strictly-increasing hashes with dense 1-based ranks") {
    val s = Sketches.kmvSketch(corpus(600)).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(s.length === Sketches.KmvK)
    assert(s.map(_._1).toSeq === (1 to Sketches.KmvK))
    assert(s.map(_._2).toSeq === s.map(_._2).toSeq.sorted)
    assert(s.map(_._2).distinct.length === s.length)
  }

  test("KMV distinct estimate lands within a few standard errors") {
    val r = Sketches.kmvDistinct(corpus(600)).collect()(0)
    val (exact, est, errBp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(est > 0 && exact > 0)
    // std error ~ 1/sqrt(k) = 6.25%; 4σ cap
    assert(errBp < 2500L, s"exact=$exact est=$est errBp=$errBp")
  }

  test("KMV merge of shard partials equals the one-pass sketch of the union") {
    val d = corpus(600)
    val parts = Seq(
      Sketches.kmvSketch(d.filter(col("doc_id") % 3 === 0)),
      Sketches.kmvSketch(d.filter(col("doc_id") % 3 === 1)),
      Sketches.kmvSketch(d.filter(col("doc_id") % 3 === 2)))
    val merged = Sketches.kmvMerge(parts.reduce(_.unionByName(_))).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val onePass = Sketches.kmvSketch(d).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(merged === onePass)
  }

  test("profileDocs: exact metrics correct, estimates present for each family") {
    val d = corpus(500)
    val m = Sketches.profileDocs(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_docs") === 500L)
    assert(m("n_tokens") ===
      d.select(explode(split(lower(trim(col("text"))), "\\s+"))).count())
    assert(m.keySet === Set("n_docs", "n_tokens", "distinct_tokens_exact",
      "distinct_tokens_hll", "distinct_tokens_kmv",
      "top_token_cnt_exact", "top_token_cnt_est",
      "doclen_p50_exact", "doclen_p50_est"))
    // CMS never underestimates; the digest's p50 stays within bound of
    // exact (same-leaf equality is typical on narrow doclen domains)
    assert(m("top_token_cnt_est") >= m("top_token_cnt_exact"))
    assert(m("distinct_tokens_exact") > 0)
  }

  test("KMV Jaccard: identical inputs estimate 1, disjoint inputs estimate 0") {
    val d = corpus(400)
    val same = Sketches.kmvJaccard(d, d).collect()(0)
    assert(same.getLong(0) === 10000L)
    assert(same.getLong(1) === 10000L)
    // disjoint vocabularies: tokens share no terms across the split
    val a = d.filter(col("doc_id") < 200)
      .select(col("doc_id"), concat(lit("xa_"), col("doc_id")).as("text"))
    val b = d.filter(col("doc_id") >= 200)
      .select(col("doc_id"), concat(lit("xb_"), col("doc_id")).as("text"))
    val dis = Sketches.kmvJaccard(a, b).collect()(0)
    assert(dis.getLong(0) === 0L)
    assert(dis.getLong(1) === 0L)
  }
}
