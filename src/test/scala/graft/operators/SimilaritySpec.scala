package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val emb =
    Similarity.intEmbeddings(
      spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")).cache()

  test("integer dot product matches a driver-side exact computation") {
    val vecs = emb.filter(col("vec_id") < 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toArray).toMap
    val got = Similarity.ipTopK(emb.filter(col("vec_id") < 3),
        emb.filter(col("vec_id") === 0), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    for ((nid, d) <- got) assert(d === dot(vecs(0L), vecs(nid)))
  }

  test("ivf lloyd refinement: recall not worse, cells better balanced, none lost") {
    val k = 10
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.ipTopK(emb, q, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(exact).size
    val strideHits = hits(Similarity.ivfTopK(emb, q, k, 16, 4, lloydIters = 0))
    val refinedHits = hits(Similarity.ivfTopK(emb, q, k, 16, 4, lloydIters = 1))
    assert(refinedHits >= strideHits,
      s"refinement degraded recall: $refinedHits < $strideHits")
    // cell balance: the refined quantizer's worst cell is no bigger (it
    // bounds worst-case probe cost), and no cell collapses empty
    val seeds = Similarity.ivfCentroids(emb, 16)
    val refined = Similarity.ivfRefine(emb, seeds, 1)
    def cellSizes(cs: Seq[(Int, Array[Long])]): Seq[Long] =
      Similarity.ivfAssign(emb, cs).groupBy("centroid_id").count()
        .collect().map(_.getLong(1)).toSeq
    val s0 = cellSizes(seeds); val s1 = cellSizes(refined)
    assert(s1.max <= s0.max, s"worst cell grew: ${s1.max} > ${s0.max}")
    assert(s1.length === 16, s"cells lost: ${s1.length}")
  }

  test("auto centroid resolution counts a fingerprinted corpus at most once") {
    // file-backed input WRITTEN FRESH here: content-fingerprintable and
    // immune to cache substitution (this suite's shared `emb` caches the
    // intEmbeddings(testdata) plan, and a cached subplan swaps in an
    // InMemoryRelation — the documented un-fingerprintable case that
    // legitimately re-counts), so the resolved √n memoizes — repeated
    // auto-mode operators re-run ZERO count jobs
    val dir =
      java.nio.file.Files.createTempDirectory("graft-autocent").toString + "/emb"
    spark.range(300).select(col("id").as("vec_id"), lit("x").as("label"),
      expr("transform(sequence(0, 3), j -> id * 7 + j)").as("v"))
      .write.parquet(dir)
    val raw = spark.read.parquet(dir)
    val before = Similarity.autoCountJobs.get()
    val n1 = Similarity.autoCentroids(raw)
    val after1 = Similarity.autoCountJobs.get()
    assert(after1 - before <= 1)
    // second resolution and a full auto-mode operator: no new counts
    assert(Similarity.autoCentroids(raw) === n1)
    Similarity.ivfCellSizes(raw, 0).collect()
    assert(Similarity.autoCountJobs.get() === after1,
      "auto resolution re-ran a count job on a memoized fingerprint")
    // an in-memory (un-fingerprintable) input still counts each time
    import spark.implicits._
    val mem = Seq((1L, "a", Seq(1L, 2L)), (2L, "b", Seq(3L, 4L)))
      .toDF("vec_id", "label", "v")
    val m0 = Similarity.autoCountJobs.get()
    Similarity.autoCentroids(mem); Similarity.autoCentroids(mem)
    assert(Similarity.autoCountJobs.get() === m0 + 2)
  }

  test("auto-scaled centroids: √n cells, balanced under refinement at 50k rows") {
    import spark.implicits._
    val n = 50000L
    // uniform deterministic vectors (xxhash64 per (id, dim) — a linear
    // congruential fill makes a degenerate lattice that collapses IVF
    // cells and would test nothing)
    val big = spark.range(n).select(col("id").as("vec_id"),
      lit("x").as("label"),
      expr("transform(sequence(0, 15), j -> pmod(xxhash64(id, j), 2000001) - 1000000)")
        .as("v"))
    assert(Similarity.autoCentroids(big) === math.ceil(math.sqrt(n.toDouble)).toInt)
    // nCentroids = 0 resolves via the √n rule inside the operator
    val sizes = Similarity.ivfCellSizes(big, 0, lloydIters = 2)
      .select("n_vecs").as[Long].collect().sorted
    assert(sizes.length === 224, s"cells: ${sizes.length}") // ceil(√50000)
    assert(sizes.sum === n)
    val median = sizes(sizes.length / 2)
    val p99 = sizes(sizes.length * 99 / 100)
    // measured 2.0–2.8 at 100k/1M; 4.0 is the guard against balance
    // regressions in the seed pick, assignment, or refinement
    assert(p99.toDouble / median <= 4.0,
      s"cell imbalance p99/median = ${p99.toDouble / median} (p99=$p99, median=$median)")
  }

  test("LSH top-k: deterministic recall vs exact baseline, bounded candidate work") {
    val k = 10
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.ipTopK(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 64, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // weak-similarity synthetic data; with seed 42 recall is deterministic.
    // The floor documents the measured operating point of (L=16, b=5).
    assert(recall >= 0.6, s"recall $recall")
    // the candidate set must be a small fraction of all pairs
    val nCand = Similarity.lshBuckets(emb, 64).join(
        Similarity.lshBuckets(queries, 64).withColumnRenamed("vec_id", "qid"),
        Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct().count()
    val allPairs = 10L * (emb.count() - 1)
    assert(nCand < allPairs / 2, s"candidates $nCand of $allPairs")
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val pairs = Similarity.nearDupPairs(emb, 350000000000L).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 350000000000L)
    }
  }

  test("cosine column agrees in ordering with integer dot for unit-normed pairs") {
    val raw = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val a = raw.filter(col("vec_id") === 0)
      .select(col("embedding").as("ea")).crossJoin(
        raw.filter(col("vec_id").between(1, 50)).select(col("vec_id"), col("embedding").as("eb")))
    val cos = a.select(col("vec_id"), Similarity.cosine("ea", "eb").as("c"))
      .orderBy(col("c").desc).collect().map(_.getLong(0)).take(5).toSeq
    val ip = Similarity.ipTopK(emb.filter(col("vec_id").between(1, 50)),
        emb.filter(col("vec_id") === 0), 5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // norms are not exactly equal, so allow set-level agreement at the top
    assert(cos.toSet.intersect(ip.toSet).size >= 3, s"cos=$cos ip=$ip")
  }

  test("IVF top-k: deterministic recall vs exact, probe-bounded candidate work") {
    val k = 10
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.ipTopK(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, queries, k, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall")
    // candidates bounded by the probed partitions (~nProbe/nCentroids)
    val cents = Similarity.ivfCentroids(emb, 16)
    val sizes = Similarity.ivfAssign(emb, cents)
      .groupBy("centroid_id").count().collect().map(_.getLong(1))
    assert(sizes.sum === emb.count())
    assert(sizes.length > 4, "degenerate quantizer: everything in few cells")
  }

  test("filtered ANN: every result satisfies the predicate; recall vs exact " +
    "filtered top-k; shared full-corpus index") {
    val k = 5
    val q = emb.filter(col("vec_id") < 8)
    val pred = col("vec_id") % 3 === 1
    val got = Similarity.ivfFilteredTopK(emb, q, k, pred,
      nCentroids = 16, nProbe = 8)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall { case (_, nid) => nid % 3 == 1 }, "predicate leaked")
    // recall against the exact filtered top-k (generous probes: 8/16)
    val exact = Similarity.ipTopK(emb.filter(pred), q, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = rows.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"filtered recall $recall")
    // candidate work is probe-bounded: never more than k results/query
    val perQ = got.groupBy("qid").count().collect().map(_.getLong(1))
    assert(perQ.forall(_ <= k))
  }

  test("kNN join covers every vector and agrees with ivfTopK on a shared query subset") {
    val k = 5
    val joined = Similarity.knnJoin(emb, k, nCentroids = 16, nProbe = 4)
    // every vector is a query with exactly k ranked neighbors (cells are
    // big enough at this SF that no probe list runs dry)
    val perQuery = joined.groupBy("qid").count().collect().map(_.getLong(1))
    assert(perQuery.length.toLong == emb.count())
    assert(perQuery.forall(_ == k))
    // restricted to the ivfTopK query set, results are identical — the
    // join is the same pipeline without the broadcast specialization
    val sub = joined.filter(col("qid") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val single = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k,
        nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(sub == single)
  }

  test("ivfCentroids is id-distribution-free: full centroid count on sparse ids, top-n plan") {
    import spark.implicits._
    // sparse, non-contiguous, skewed id space: the old `vec_id % stride`
    // pick found almost no seeds here (stride ≈ 10^7 over 100 rows)
    val sparse = Similarity.intEmbeddings(
      (0 until 100).map { i =>
        val id = 1000000007L * (i + 1) + (if (i % 3 == 0) 13L else 0L)
        (id, s"l${i % 4}", Array.tabulate(8)(d => ((i * 31 + d * 7) % 200 - 100) / 100.0f))
      }.toDF("vec_id", "label", "embedding"))
    val cents = Similarity.ivfCentroids(sparse, 16)
    assert(cents.length == 16, s"under-picked: ${cents.length}")
    assert(cents.map(_._1) == (0 until 16), "cids must be dense 0..n-1")
    // the seed scan must plan as a distributed top-n, not a full sort
    val plan = sparse.select(col("vec_id"), col("v"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(16).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("DotTopKGrouped probing all groups equals brute force; two-level is close") {
    import org.apache.spark.sql.graftbridge.Bridge
    val cents = Similarity.ivfCentroids(emb, 100)
    val g = Similarity.coarseGroups(cents)
    val dim = 64
    def grouped(cProbe: Int, k: Int) = Bridge.column(
      graft.functions.DotTopKGrouped(Bridge.expression(col("v")),
        g.coarse, g.nCoarse, g.fine, g.offsets, g.cids, cProbe, k, dim))
    // probing EVERY coarse group makes two-level exhaustive: must equal
    // the driver-computed flat top-k by (dot desc, cid asc), row by row
    val got = emb.select(col("vec_id"), grouped(g.nCoarse, 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val byCid = cents.toMap
    for ((vid, probes) <- got) {
      val expect = cents.map { case (cid, c) => (dot(vecs(vid), c), cid) }
        .sortBy { case (d, cid) => (-d, cid) }.take(3).map(_._2)
      assert(probes == expect, s"vec $vid: $probes vs $expect")
    }
    // the real two-level operating point (cProbe=2) must agree with the
    // exhaustive argmax for the vast majority of vectors (boundary cells
    // are the documented coarse-fine trade)
    // the default assignment operating point (assignProbe=4) must agree
    // with the exhaustive argmax for most vectors EVEN on this
    // worst-case near-random fixture (measured deterministic 404/500;
    // rises to 480/500 at cProbe=8 — boundary cells are the documented
    // coarse-fine trade, much rarer on genuinely clustered corpora)
    val twoLevel = emb.select(col("vec_id"), element_at(grouped(4, 1), 1).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = twoLevel.count { case (vid, cid) =>
      cid == cents.map { case (c, v) => (dot(vecs(vid), v), c) }
        .sortBy { case (d, c) => (-d, c) }.head._2
    }
    assert(agree >= (twoLevel.size * 3) / 4, s"two-level agreement $agree/${twoLevel.size}")
    assert(byCid.size == 100)
  }

  test("large nCentroids switches assignment and probes to the two-level path") {
    val nC = 100
    val cents = Similarity.ivfCentroids(emb, nC)
    val assigned = Similarity.ivfAssign(emb, cents)
    assert(assigned.queryExecution.executedPlan.toString.contains("dot_topk_grouped"),
      "two-level assignment expression not engaged")
    val cids = assigned.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cids.forall(c => c >= 0 && c < nC))
    assert(assigned.count() == emb.count())
    // end-to-end: two-level ivfTopK keeps useful recall vs exact
    val k = 10
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.ipTopK(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, queries, k, nCentroids = nC, nProbe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"two-level IVF recall $recall")
  }

  test("DotTopKGrouped interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val cents = (0 until 9).map(i => (i, Array.tabulate(4)(d => (i * 10 + d).toLong)))
    val g = Similarity.coarseGroups(cents)
    val v = Array(3L, -1L, 2L, 5L)
    val e = graft.functions.DotTopKGrouped(
      Literal.create(v.toSeq, ArrayType(LongType)),
      g.coarse, g.nCoarse, g.fine, g.offsets, g.cids,
      cProbe = g.nCoarse, k = 2, dim = 4)
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expect = cents.map { case (cid, c) => (dot(v, c), cid) }
      .sortBy { case (d, cid) => (-d, cid) }.take(2).map(_._2)
    assert(interpreted == expect)
  }

  test("semanticClusters merges transitively and labels with the minimum vec_id") {
    import spark.implicits._
    // unit circle at 0°, 60°, 120°, 270° with threshold 0.35: a~b and
    // b~c (cos 60° = 0.5) but NOT a~c (cos 120° = -0.5) — the cluster
    // {a,b,c} exists only through transitive resolution; d has no edge
    val e = Similarity.intEmbeddings(Seq(
      (1L, "q", Array(1.0f, 0.0f)),
      (2L, "q", Array(0.5f, 0.8660254f)),
      (3L, "q", Array(-0.5f, 0.8660254f)),
      (9L, "q", Array(0.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding"))
    val minDot = 350000000000L // 0.35 at unit norms, 1e6 fixed-point
    val clus = Similarity.semanticClusters(e, k = 3, nCentroids = 2, nProbe = 2,
        minDot = minDot).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clus == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // fixture-scale: every cluster is labeled by its minimum member
    val fix = Similarity.semanticClusters(emb, 5, 16, 4, minDot).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fix.nonEmpty)
    fix.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.length >= 2 && members.map(_._1).min == cid)
    }
  }

  test("semanticIncremental drops batch vectors near a prior vector, keeps novel ones") {
    import spark.implicits._
    // prior corpus spans three axes; the batch has a near-copy of prior
    // vector 1 (must drop) and a vector on the free fourth axis (keeps)
    val prior = Similarity.intEmbeddings(Seq(
      (1L, "p", Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, "p", Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, "p", Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding"))
    val batch = Similarity.intEmbeddings(Seq(
      (11L, "n", Array(0.99f, 0.1f, 0.0f, 0.0f)), // ~prior 1: dot 0.99e12
      (12L, "n", Array(0.0f, 0.0f, 0.0f, 1.0f))   // orthogonal to all
    ).toDF("vec_id", "label", "embedding"))
    val key = "spec-inc-" + System.nanoTime
    val kept = Similarity.semanticIncremental(batch, prior, key,
        minDot = 350000000000L, nCentroids = 2, nProbe = 2).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(12L))
    // first night: empty prior corpus -> the whole batch survives
    val first = Similarity.semanticIncremental(batch, prior.filter(lit(false)),
        key + "-empty", minDot = 350000000000L, nCentroids = 2, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(first == Set(11L, 12L))
    // the prior assignment table was materialized once and is reused
    // (in-memory fixture -> the no-files sentinel key component)
    val path = Similarity.sharedAssigns.pathOf(s"$key|${TableMemo.keyOf(prior)}|c=2")
    assert(path.isDefined)
    Similarity.semanticIncremental(batch, prior, key,
      minDot = 350000000000L, nCentroids = 2, nProbe = 2).collect()
    assert(Similarity.sharedAssigns.pathOf(s"$key|${TableMemo.keyOf(prior)}|c=2") == path)
  }

  test("diversitySample: per-cell cap, score-ordered ranks, and no window in the plan") {
    import spark.implicits._
    val scores = emb.select(col("vec_id"), (col("vec_id") % 97).as("score"))
    val q = Similarity.diversitySample(emb, scores, perCell = 3, nCentroids = 8)
    // bounded top-k AGGREGATE, not a window — the mega-cell safety
    assert(!q.queryExecution.executedPlan.toString.contains("Window"))
    val rows = q.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byCell = rows.groupBy(_._2)
    assert(byCell.nonEmpty)
    byCell.values.foreach { cell =>
      assert(cell.length <= 3)
      // ranks contiguous from 1, scores non-increasing, ids break ties asc
      val sorted = cell.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to cell.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1), s"$a !>= $b")
        case _ =>
      }
    }
  }

  test("content-keyed memo: rewriting data at the same path invalidates the entry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck-").toString
    emb.filter(col("vec_id") < 100).write.mode("overwrite").parquet(dir)
    val k1 = TableMemo.contentKey(spark.read.parquet(dir))
    assert(k1.isDefined)
    // re-reading unchanged data fingerprints identically
    assert(TableMemo.contentKey(spark.read.parquet(dir)) == k1)
    // an in-memory plan has no file lineage
    import spark.implicits._
    assert(TableMemo.contentKey(Seq((1L, "x")).toDF("a", "b")).isEmpty)
    // rewrite at the SAME path -> new fingerprint -> sharedKnnJoin
    // mints a second memo entry instead of serving the stale table
    val key = "spec-ck-" + System.nanoTime
    Similarity.sharedKnnJoin(spark.read.parquet(dir), key, 2, 4, 2).collect()
    assert(Similarity.sharedJoins.countKeys(key) == 1)
    emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
      .write.mode("overwrite").parquet(dir)
    val k2 = TableMemo.contentKey(spark.read.parquet(dir))
    assert(k2.isDefined && k2 != k1)
    Similarity.sharedKnnJoin(spark.read.parquet(dir), key, 2, 4, 2).collect()
    assert(Similarity.sharedJoins.countKeys(key) == 2)
  }

  test("sharedKnnJoin materializes the edge table once per key, edges identical to knnJoin") {
    val small = emb.filter(col("vec_id") < 200)
    val key = "spec-knn-" + System.nanoTime
    val direct = Similarity.knnJoin(small, 3, 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    val a = Similarity.sharedKnnJoin(small, key, 3, 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    assert(a == direct)
    val ck = TableMemo.keyOf(small)
    val path = Similarity.sharedJoins.pathOf(s"$key|$ck|k=3|c=8|p=2")
    assert(path.isDefined)
    // second consumer reads the SAME materialized table (no recompute)
    Similarity.sharedKnnJoin(small, key, 3, 8, 2).collect()
    assert(Similarity.sharedJoins.pathOf(s"$key|$ck|k=3|c=8|p=2") == path)
    // distinct parameters are a distinct table
    Similarity.sharedKnnJoin(small, key, 2, 8, 2).collect()
    assert(Similarity.sharedJoins.pathOf(s"$key|$ck|k=2|c=8|p=2") != path)
  }

  test("quantizeInt8: exact truncating arithmetic, zero-vector guard, element fingerprint") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1000000L, -500000L, 3L)),
      (2L, Seq(0L, 0L, 0L)) // zero vector: amax guard kicks in
    ).toDF("vec_id", "v")
    val out = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // q = [127, trunc(-63.5) = -63, 0]; recon errors 0 + 3938 + 3
    assert(out(1L) == ((1000000L, md5hex("127,-63,0"), 3941L)))
    assert(out(2L) == ((1L, md5hex("0,0,0"), 0L)))
  }

  test("GraftCatalog registers tables and functions for plain SQL") {
    graft.sources.GraftCatalog.registerAll(spark, sf("sf0.001"))
    assert(spark.sql("SELECT count(*) FROM part").head().getLong(0) === 200L)
    assert(spark.sql(
      "SELECT zorder(p_size, cast(floor(p_retailprice) as int)) FROM part LIMIT 1")
      .head().getLong(0) >= 0L)
    assert(spark.sql("SELECT dot_long(array(1L,2L), array(3L,4L))").head().getLong(0) === 11L)
  }

  test("ivfPqTopK composes: neighbors only from probed cells, scores are ADC scores") {
    val e = Similarity.intEmbeddings(
      spark.read.parquet(sf("sf0.01") + "/embeddings.parquet"))
    val q = e.filter(col("vec_id") < 10)
    // k large enough to surface EVERY probed candidate / every pair
    val ivfAll = Similarity.ivfTopK(e, q, 100000, nCentroids = 16, nProbe = 4)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcAll = Similarity.pqTopK(e, q, 100000, 16, 32, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val out = Similarity.ivfPqTopK(e, q, 10, 16, 4, 16, 32, 1).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty)
    out.foreach { case (pair, score, rank) =>
      assert(ivfAll.contains(pair), s"$pair outside the probed cells")
      assert(adcAll(pair) === score, s"$pair score is not the ADC score")
      assert(rank >= 1 && rank <= 10)
    }
    // and it is a true top-k of the ADC scores WITHIN the candidate set
    val byQ = out.groupBy(_._1._1)
    byQ.foreach { case (qid, rows) =>
      val returned = rows.map(_._2).toSeq.sorted.reverse
      val candBest = ivfAll.filter(_._1 == qid).map(adcAll).toSeq.sorted.reverse
        .take(rows.length)
      assert(returned === candBest, s"query $qid: not the candidate-set ADC top-k")
    }
  }

  test("ivfPqRerankTopK: exact dots, candidates from the ADC cut, recall >= 0.8 " +
    "at the gated operating point") {
    val q = emb.filter(col("vec_id") < 10)
    val k = 10
    // gate operating point: 16 centroids, 12 probes, 16x32 PQ, C=100
    val out = Similarity.ivfPqRerankTopK(emb, q, k, rerankC = 100,
      nCentroids = 16, nProbe = 12, m = 16, nCodes = 32, pqIters = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getInt(3)))
    // every returned pair must be inside the ADC top-C nomination
    val adcCut = Similarity.ivfPqTopK(emb, q, 100, 16, 12, 16, 32, 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ... and carry the EXACT integer dot, not the ADC approximation
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    out.foreach { case (pair @ (qid, nid), d, rank) =>
      assert(adcCut.contains(pair), s"$pair outside the ADC nomination")
      assert(d === dot(vecs(qid), vecs(nid)), s"$pair dot is not exact")
      assert(rank >= 1 && rank <= k)
    }
    // recall vs the exact baseline: the refine stage must lift the
    // pure-ADC ~0.49 to >= 0.8 (measured 0.86 on this fixture)
    val exact = Similarity.ipTopK(emb, q, k)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = out.map(_._1).count(exact.contains)
    assert(hits >= 80, s"recall@10 ${hits / 100.0} below 0.8")
  }

  test("PQ: codebook rows encode to themselves; ADC scores reconstruct exact dots " +
    "for codebook-aligned vectors") {
    import spark.implicits._
    val m = 2; val nCodes = 4; val d = 2 // dim 4, 2 subspaces of 2
    // corpus whose first nCodes rows are the hash-order seeds; no Lloyd
    // round (iters = 0) so the codebooks ARE those rows' subvectors
    val vecs = Seq(
      0L -> Array(10L, 0L, 0L, 10L),
      1L -> Array(0L, 10L, 10L, 0L),
      2L -> Array(7L, 7L, 7L, 7L),
      3L -> Array(-5L, 5L, 5L, -5L),
      4L -> Array(10L, 0L, 10L, 0L), // mixes sub-0 of seed0 with sub-1 of seed1
      5L -> Array(0L, 10L, 0L, 10L)
    )
    val emb = vecs.toDF("vec_id", "v")
    val books = Similarity.pqCodebooks(emb, m, nCodes, iters = 0)
    assert(books.length === m)
    books.foreach(b => assert(b.length === nCodes))
    val codes = Similarity.pqEncode(emb, books).collect()
      .map(r => r.getLong(0) -> (1 until 1 + m).map(r.getInt).toSeq).toMap
    // hash order picks 4 of the 6 rows as seeds; whichever they are,
    // every row must encode each subspace to a true L2-argmin code, and
    // a row whose subvector IS a codebook entry must land at distance 0
    for ((id, cs) <- codes; s <- 0 until m) {
      val sub = vecs.toMap.apply(id).slice(s * d, s * d + d).toSeq
      val entry = books(s)(cs(s)).toSeq
      val l2self = sub.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum
      val l2code = sub.zip(entry).map { case (a, b) => (a - b) * (a - b) }.sum
      // the chosen code is a true L2 argmin over the codebook
      books(s).foreach { cand =>
        val l2cand = sub.zip(cand).map { case (a, b) => (a - b) * (a - b) }.sum
        assert(l2code <= l2cand, s"doc $id sub $s: code not argmin")
      }
      if (books(s).exists(_.toSeq == sub)) assert(l2code === 0L, s"doc $id sub $s")
      assert(l2self === 0L) // tautology guard for the generator above
    }
    // ADC: for vectors whose subvectors all sit ON codebook entries the
    // approximate score equals the exact dot
    val q = emb.filter(col("vec_id") === 0L)
    val adc = Similarity.pqTopK(emb, q, k = 5, m, nCodes, iters = 0).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val v0 = vecs.toMap.apply(0L)
    for ((id, v) <- vecs; if id != 0L) {
      val exactDot = v0.zip(v).map { case (a, b) => a * b }.sum
      val cs = codes(id)
      val recon = (0 until m).flatMap(s => books(s)(cs(s))).toArray
      val adcExpected = v0.zip(recon).map { case (a, b) => a * b }.sum
      assert(adc(id) === adcExpected, s"doc $id ADC mismatch")
      if (recon.toSeq == v.toSeq) assert(adc(id) === exactDot, s"doc $id")
    }
  }

  test("randomProject applies the md5 ±1 matrix exactly and is " +
    "partitioning-independent") {
    import spark.implicits._
    // basis vectors isolate single matrix columns: projecting
    // 1000·e_d must yield exactly 1000·M[j][d] in component j
    val m = Similarity.projectionMatrix(8, 4)
    val basis = (0 until 8).map { d =>
      (d.toLong, 0, Array.tabulate(8)(i => if (i == d) 1000L else 0L))
    }.toDF("vec_id", "label", "v")
    val got = Similarity.randomProject(basis, 8, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toArray).toMap
    for (d <- 0 until 8; j <- 0 until 4)
      assert(got(d.toLong)(j) === m(j)(d) * 1000L, s"d=$d j=$j")
    val rep = Similarity.randomProject(basis.repartition(5), 8, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSeq).toMap
    assert(rep === got.view.mapValues(_.toSeq).toMap)
  }

  test("projectRerankTopK with c >= corpus equals the exact top-k") {
    val q = emb.filter(col("vec_id") < 2)
    val exact = Similarity.ipTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val rr = Similarity.projectRerankTopK(emb, q, 64, 16, 5, c = 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // the shortlist covers everything, so the exact re-rank IS exact
    assert(rr === exact)
  }

  test("mmrRerankTopK replays a driver-side greedy MMR exactly") {
    val k = 5; val c = 10; val nq = 3
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = (0L until nq).flatMap { q =>
      val short = vecs.keys.filter(_ != q).toSeq
        .map(n => (n, dot(vecs(q), vecs(n))))
        .sortBy { case (n, d) => (-d, n) }.take(c)
      var picked = List.empty[Long]
      (1 to k).map { step =>
        val (nid, sc) = short.filterNot(t => picked.contains(t._1))
          .map { case (n, rel) =>
            val red = if (picked.isEmpty) 0L
                      else picked.map(p => dot(vecs(n), vecs(p))).max
            (n, 7L * rel - (if (picked.isEmpty) 0L else 3L * red))
          }
          .minBy { case (n, sc) => (-sc, n) }
        picked :+= nid
        (q, step, nid, sc)
      }
    }.toSet
    val got = Similarity.mmrRerankTopK(emb, emb.filter(col("vec_id") < nq), k, c)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("mmrRerankTopK disperses a redundant shortlist where pure top-k repeats it") {
    import spark.implicits._
    // cluster A: three long near-copies, maximally relevant — their
    // mutual dot (norm²) dwarfs their relevance, so after the first A
    // pick the 3·maxSim penalty buries the other copies; cluster B is
    // less relevant but near-orthogonal to A. Pure top-3 = all of A;
    // MMR at λ=7/10 must pull in B at rank 2.
    def v(x: Long, y: Long) = Array(x * 1000L, y * 1000L)
    val rows = Seq(
      (100L, 0, v(4000, 0)), (101L, 0, v(3999, 1)), (102L, 0, v(3998, 2)),
      (200L, 1, v(500, 500)))
    val e = rows.toDF("vec_id", "label", "v")
    val q = Seq((0L, 0, v(1000, 0))).toDF("vec_id", "label", "v")
    val mmr = Similarity.mmrRerankTopK(e, q, k = 3, c = 4)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(mmr.head === 100L)      // rank 1 is pure relevance
    assert(mmr.take(2).contains(200L), // diversity kicks in by rank 2
      s"MMR kept the redundant cluster: $mmr")
    // and is partitioning-independent
    val rep = Similarity.mmrRerankTopK(e.repartition(3), q, k = 3, c = 4)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(rep === mmr)
  }
}
