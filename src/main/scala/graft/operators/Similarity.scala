package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`) — the
 * high-dimensional generalization of the point store's kNN (SURVEY §7.1
 * step 6).
 *
 *  - Exact top-k by inner product / cosine: broadcast the (small) query
 *    set against the embedding table — one scan, no all-pairs shuffle.
 *  - Near-dup pairs: blocked all-pairs within a blocking key (label,
 *    cluster id, LSH bucket …) — the blocking bound is what makes this
 *    feasible at scale; never an unblocked cross join.
 *  - Random-hyperplane LSH: L tables × b sign bits from seeded
 *    hyperplanes; candidates share a bucket in ≥1 table, then exact
 *    re-rank. Scan cost drops to the candidate fraction; recall is
 *    tunable via (L, b) — measured deterministically in `SimilaritySpec`.
 *
 * Determinism policy: the oracle-gated paths use fixed-point integer
 * arithmetic — elements scaled by 1e6 to BIGINT, so dot products
 * (≤ ~6e12 per pair here) are exact integers in any engine and any
 * summation order. Float cosine is exposed too (`cosine`) for ranking
 * use; its ordering equals integer-dot ordering for same-norm inputs.
 */
object Similarity {

  val Scale = 1000000L

  /** Fixed-point copy of the embedding table: `(vec_id, label, v)` with
    * `v: Array[Long]` = round(embedding * 1e6). Element-cast to double
    * first so scaling and rounding are IEEE-double in every engine. */
  def intEmbeddings(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
      expr(s"transform(embedding, x -> cast(round(cast(x as double) * $Scale) as bigint))")
        .as("v"))

  /** Exact integer inner product of two BIGINT vectors — the native
    * fused-loop expression [[graft.functions.DotLong]] (no UDF, no
    * intermediate array per pair). */
  def dotInt(a: String, b: String): Column =
    graft.functions.GraftFunctions.dot_long(col(a), col(b))

  /** Float cosine similarity of two float-array columns (double math). */
  def cosine(a: String, b: String): Column = {
    def dot(u: String, w: String) =
      s"aggregate(zip_with($u, $w, (x, y) -> cast(x as double) * cast(y as double)), 0d, (acc, z) -> acc + z)"
    expr(s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))")
  }

  /**
   * Exact top-k neighbors by integer inner product for each query
   * vector: broadcast the query side, rank with a per-query window.
   * Ties break on neighbor id — fully deterministic.
   */
  def ipTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("v").as("qv")))
    val scored = emb.select(col("vec_id").as("nid"), col("v"))
      .join(q, col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), dotInt("qv", "v").as("dot"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "dot", "rank")
  }

  /** Blocked near-duplicate pairs: all pairs sharing `blockCol` with
    * integer inner product ≥ `minDot`. */
  def nearDupPairs(emb: DataFrame, minDot: Long, blockCol: String = "label"): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col(blockCol).as("blk"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col(blockCol).as("blk"), col("v").as("vb"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), dotInt("va", "vb").as("dot"))
      .filter(col("dot") >= minDot)
  }

  /**
   * Hyperplane matrix for [[lshBuckets]]: component (t, b, d) is
   * md5-derived — from `md5("plane:<seed>:<t>:<b>:<d>")` take four
   * 5-hex-char chunks (four 20-bit uniforms) and sum them, centered at
   * zero (Irwin–Hall n=4, a close gaussian approximation — a SINGLE
   * uniform costs ~0.2 recall vs gaussian directions at the pinned
   * operating point; the 4-sum recovers it). md5-derivation (rather
   * than a JVM PRNG) makes the planes reproducible in ANY engine, so
   * the whole LSH pipeline is oracle-checkable in SQL. |coef| ≤ 2^21
   * keeps the sign-test dot exact in 64-bit: |acc| ≤ dim · 2^21 ·
   * max|v| ≪ 2^63 for fixed-point inputs up to ~2^30.
   */
  def hyperplanes(dim: Int, tables: Int, bits: Int, seed: Long): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables * bits * dim) { idx =>
      val t = idx / (bits * dim); val b = (idx / dim) % bits; val d = idx % dim
      val hex = md.digest(s"plane:$seed:$t:$b:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until 4).map(j => java.lang.Long.parseLong(hex.substring(j * 5, j * 5 + 5), 16))
        .sum - 2097152L
    }
  }

  /**
   * Random-hyperplane LSH index: for each of `tables` hash tables,
   * a `bits`-bit signature of hyperplane sign tests (`dot >= 0`).
   * Hyperplane components are md5-derived from the seed
   * ([[hyperplanes]]) and baked into the plan as literals, so the index
   * is reproducible — bit-identical even cross-engine. Returns
   * `(vec_id, table_id, bucket)`.
   */
  def lshBuckets(emb: DataFrame, dim: Int, tables: Int = 16, bits: Int = 5,
                 seed: Long = 42L): DataFrame = {
    // flattened into one matrix evaluated by a single fused expression —
    // tables*bits separate dot expressions ran ~40x slower (plan bloat)
    val planes = hyperplanes(dim, tables, bits, seed)
    val bucketsCol = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.HyperplaneBuckets(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("v")),
        planes, tables, bits, dim))
    emb.select(col("vec_id"), posexplode(bucketsCol))
      .select(col("vec_id"), col("pos").as("table_id"), col("col").as("bucket"))
  }

  /**
   * IVF coarse quantizer: `nCentroids` centroids picked by a
   * deterministic stride over vec_id order (a seeded k-means refinement
   * would slot in here; stride suffices for a partitioning quantizer),
   * every vector assigned to its max-inner-product centroid. The
   * assignment is a plan-literal broadcast — one pass, no shuffle.
   * Returns `(vec_id, centroid_id, v)`.
   */
  def ivfAssign(emb: DataFrame, centroids: Seq[(Int, Array[Long])]): DataFrame = {
    // one fused argmax loop over the centroid matrix (codegen reference
    // object) — k separate dot-product expressions would bloat the plan
    val dim = centroids.head._2.length
    val matrix = centroids.sortBy(_._1).flatMap(_._2).toArray
    val assignExpr = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.DotArgmax(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("v")),
        matrix, centroids.length, dim))
    emb.withColumn("centroid_id", assignExpr)
      .select(col("vec_id"), col("centroid_id"), col("v"))
  }

  /** Deterministic centroid choice: every (n/nCentroids)-th vector in
    * vec_id order. Metadata-scale driver state (nCentroids vectors). */
  def ivfCentroids(emb: DataFrame, nCentroids: Int): Seq[(Int, Array[Long])] = {
    val n = emb.count()
    val stride = math.max(1L, n / nCentroids)
    emb.filter(col("vec_id") % stride === 0).orderBy("vec_id")
      .limit(nCentroids).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](r.fieldIndex("v")).toArray) }
      .toSeq
  }

  /**
   * Deterministic integer Lloyd refinement of IVF centroids: assign
   * every vector to its argmax-dot centroid, then replace each centroid
   * with the elementwise integer mean of its cell (TRUNCATING division
   * toward zero — JVM `Long./` and DuckDB `//` agree, so the refinement
   * is bit-reproducible in the oracle); an empty cell keeps its old
   * centroid. One distributed pass per iteration: a single groupBy with
   * `dim` map-side-combinable sums — no explode, no extra shuffle
   * shape. Improves cell balance over the raw stride quantizer, which
   * is what bounds worst-case probe cost at scale.
   */
  def ivfRefine(emb: DataFrame, cents: Seq[(Int, Array[Long])],
                iters: Int = 1): Seq[(Int, Array[Long])] = {
    val dim = cents.head._2.length
    var cs = cents
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(emb, cs)
      val aggs = count(lit(1)).cast("long").as("n") +:
        (0 until dim).map(i => sum(expr(s"v[$i]")).as(s"s$i"))
      val rows = assigned.groupBy("centroid_id").agg(aggs.head, aggs.tail: _*)
        .collect()
      val means = rows.map { r =>
        val cid = r.get(0).asInstanceOf[Number].intValue
        val n = r.getLong(1)
        (cid, Array.tabulate(dim)(i => r.getLong(2 + i) / n))
      }.toMap
      cs = cs.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cs
  }

  /**
   * IVF approximate top-k: probe the `nProbe` nearest centroids per
   * query, rerank candidates exactly. Scan cost ≈ nProbe/nCentroids of
   * the table — the standard ANN trade (recall measured in
   * `SimilaritySpec`). `lloydIters` > 0 refines the stride seeds with
   * deterministic integer k-means ([[ivfRefine]]).
   */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 0): DataFrame = {
    val seeds = ivfCentroids(emb, nCentroids)
    val cents = if (lloydIters > 0) ivfRefine(emb, seeds, lloydIters) else seeds
    val assigned = ivfAssign(emb, cents)
    val scored = cents.map { case (cid, c) =>
      struct(graft.functions.GraftFunctions.dot_long(col("v"), typedLit(c)).as("d"),
        lit(cid).as("cid"))
    }
    val qProbes = queries
      .withColumn("probes",
        slice(sort_array(array(scored: _*), asc = false), 1, nProbe))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(expr("transform(probes, p -> p.cid)")).as("centroid_id"))
    // (qid, nid) is unique by construction — every neighbor sits in
    // exactly one cell and a query's probe list is distinct — so no
    // dedup pass is needed between the join and the rank
    val scoredCand = assigned
      .join(broadcast(qProbes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), dotInt("qv", "v").as("dot"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    scoredCand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "dot", "rank")
  }

  /**
   * IVF-blocked kNN JOIN: the k nearest neighbors (by exact integer
   * inner product) for EVERY vector in the table — the primitive behind
   * semantic dedup, diversity filtering, and embedding-space clustering
   * of a whole corpus. Unlike [[ivfTopK]] the query side is the table
   * itself, so nothing is broadcast: per-vector probe lists (top
   * `nProbe` centroids, computed by the same plan-literal centroid
   * dots) equi-join the cell assignment on `centroid_id`, candidates
   * are re-ranked exactly, and a per-query window keeps k.
   *
   * Scale shape: ONE shuffle on `centroid_id` (candidate generation) +
   * one on `qid` (rank). Candidate volume is `nProbe/nCentroids` of the
   * all-pairs square — the IVF trade; at 100 TB raise `nCentroids` to
   * ~sqrt(n) (cells stay balanced via [[ivfRefine]]) so per-cell
   * work is bounded. Cell skew is the thing to watch: refined centroids
   * bound it, and AQE's skew-join split handles residual hot cells.
   */
  def knnJoin(emb: DataFrame, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 0): DataFrame = {
    val seeds = ivfCentroids(emb, nCentroids)
    val cents = if (lloydIters > 0) ivfRefine(emb, seeds, lloydIters) else seeds
    val assigned = ivfAssign(emb, cents)
    val scored = cents.map { case (cid, c) =>
      struct(graft.functions.GraftFunctions.dot_long(col("v"), typedLit(c)).as("d"),
        lit(cid).as("cid"))
    }
    val qProbes = emb
      .withColumn("probes",
        slice(sort_array(array(scored: _*), asc = false), 1, nProbe))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(expr("transform(probes, p -> p.cid)")).as("centroid_id"))
    val scoredCand = assigned
      .join(qProbes, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), dotInt("qv", "v").as("dot"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    scoredCand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "dot", "rank")
  }

  /**
   * Approximate top-k: LSH candidate generation (same bucket in ≥1
   * table) + exact integer-dot re-rank. The scale path for ANN when the
   * table no longer admits a full scan per query.
   */
  def lshTopK(emb: DataFrame, queries: DataFrame, dim: Int, k: Int,
              tables: Int = 16, bits: Int = 5, seed: Long = 42L,
              queriesWithinEmb: Option[Column] = None): DataFrame = {
    val buckets = lshBuckets(emb, dim, tables, bits, seed)
    // when the query set is a predicate over the indexed table itself,
    // reuse the bucket table instead of re-hashing (halves the codegen
    // and scan work — the common "self-join ANN" shape)
    val qb = queriesWithinEmb match {
      case Some(pred) => buckets.filter(pred).withColumnRenamed("vec_id", "qid")
      case None => lshBuckets(queries, dim, tables, bits, seed)
        .withColumnRenamed("vec_id", "qid")
    }
    val candidates = buckets.join(qb, Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid")).distinct()
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("v").as("qv")))
    val scored = candidates
      .join(emb.select(col("vec_id").as("nid"), col("v")), "nid")
      .join(q, "qid")
      .select(col("qid"), col("nid"), dotInt("qv", "v").as("dot"))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "dot", "rank")
  }
}
