package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CheckpointScope.Scoped

/**
 * A distributed, exactly-reproducible linear classifier — the
 * "fasttext-style" targeting/quality filter every production curation
 * stack trains against a reference signal (GPT-3's WebText classifier,
 * LLaMA's Wikipedia filter, CCNet's LM gate are all this shape):
 * hashed bag-of-words features, a linear decision rule, train on
 * labels, score and filter the corpus.
 *
 * The trainer is the DISTRIBUTED PERCEPTRON VIA ITERATIVE PARAMETER
 * MIXING (McDonald, Hall & Mann, NAACL 2010): each epoch, every shard
 * runs the classic online perceptron over ITS documents starting from
 * the shared weights, and the shards' weight deltas are then averaged.
 * Two design points make the parallel run bit-identical to the
 * [[oracleCore]] replay, with no floating point anywhere:
 *
 *  - shards are LOGICAL — `doc_id % shards` — and each shard folds its
 *    documents in `doc_id` order, so the training sequence is a pure
 *    function of the data, independent of partitioning or cluster
 *    shape (a `repartition`-based split would not be);
 *  - the online step is scaled by `step = shards·128`: every delta is
 *    a multiple of the shard count, so the mixing average
 *    `Σ deltas / shards` is EXACT integer division — the true McDonald
 *    average, not a floor approximation that zeroes sparse
 *    single-shard signals (`3 // 8 = 0` would unlearn rare features).
 *
 * Why not the plain batch perceptron (sum `y·x` over all misclassified
 * per epoch)? It is order-free for free, but the full-batch update
 * overshoots by the misclassified-set size and oscillates between
 * majority predictions — measured on the gate fixture it never leaves
 * majority-class accuracy, while this trainer converges. Within-shard
 * sequential updates are the damping; mixing is the parallelism.
 *
 * Scale shape: the corpus is scanned and SHUFFLED ONCE — the feature
 * table (`(doc_id, y, buckets[], counts[])`, one row per document,
 * ≤ `buckets`+1 sparse entries each) hash-partitions by shard, sorts
 * `(shard, doc_id)` within partitions, and localCheckpoints in that
 * layout (released on return). Every epoch is then a SHUFFLE-FREE
 * `mapPartitions` over the resident partitions: rows stream through
 * the fold (never materialized per shard), shard boundaries are
 * detected in the sorted stream, and each shard emits one
 * `buckets+1`-long delta vector — collected at model scale
 * (shards × weights), never data scale. The per-epoch
 * `groupByKey(shard)` alternative re-exchanges the feature table
 * every epoch: measured 227 s vs 32.7 s for 10 epochs at 1M docs.
 * Driver state is the weight vector alone; shard count is the
 * parallelism knob (more shards = more parallel folds, slightly more
 * mixing averaging).
 */
object Perceptron {

  /** Feature-space size (hash buckets; index `buckets` is the bias).
    * 128 keeps the gate fixture's ~40-word vocabulary collision-free
    * while staying model-scale; real corpora would raise it. */
  val Buckets = 128

  /** Logical training shards (the parallelism of the online folds). */
  val Shards = 8

  /** Epochs — fixed, part of the oracle contract. */
  val Epochs = 10

  /** Online update scale: a multiple of [[Shards]] so the mixing
    * average is exact in integers. */
  val Step: Long = Shards.toLong * 128L

  /** Gate-fixture label: documents mentioning the target term are the
    * positive class (reference-corpus targeting). The padded-LIKE form
    * parses and evaluates identically in Spark and DuckDB. */
  val LabelSql =
    "CASE WHEN ' ' || lower(trim(text)) || ' ' LIKE '% spark %' THEN 1 ELSE -1 END"

  /** Token→bucket hash, Spark spelling (house 60-bit md5 convention,
    * seeded 'pc:'). */
  private def bucketSpark(buckets: Int): String =
    s"pmod(cast(conv(substr(md5(concat('pc:', t)), 1, 15), 16, 10) as bigint), $buckets)"

  /** The DuckDB twin of [[bucketSpark]] (shared with the streaming
    * gate's oracle, which scores extracted text under the trained
    * weights). */
  private[graft] def bucketDuck(buckets: Int): String =
    s"CAST(('0x' || substr(md5('pc:' || t), 1, 15)) AS BIGINT) % $buckets"

  /** One training example: sparse hashed counts (parallel arrays,
    * bucket-ascending) + the bias entry at index `buckets`. */
  final case class Example(doc_id: Long, y: Int,
    bs: Array[Long], cs: Array[Long])

  /**
   * Hashed sparse feature table — one row per document: token-count
   * buckets (bucket-ascending) plus the trailing bias entry. One
   * corpus scan, one map-side-combinable aggregate.
   */
  def examples(docs: DataFrame, buckets: Int = Buckets,
               labelSql: String = LabelSql): Dataset[Example] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), expr(labelSql).as("y"),
        TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("y"),
        explode(expr(s"transform(ws, t -> ${bucketSpark(buckets)})")).as("bucket"))
      .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "y")
      .agg(sort_array(collect_list(struct(col("bucket"), col("cnt"))))
        .as("fs"))
      .select(col("doc_id"), col("y").cast("int").as("y"),
        expr(s"array_append(transform(fs, f -> f.bucket), cast($buckets as bigint))").as("bs"),
        expr("array_append(transform(fs, f -> f.cnt), cast(1 as bigint))").as("cs"))
      .as[Example]
  }

  /**
   * Iterative-parameter-mixing training; returns the `buckets+1`
   * weight vector (index `buckets` = bias), in [[Step]]-scaled units.
   */
  def ipmTrain(docs: DataFrame, buckets: Int = Buckets,
               shards: Int = Shards, epochs: Int = Epochs,
               labelSql: String = LabelSql): Array[Long] = {
    import docs.sparkSession.implicits._
    // shuffle ONCE: hash-partition by shard, sort (shard, doc_id), and
    // checkpoint that layout — every epoch is then a shuffle-free
    // mapPartitions over the resident partitions (the naive
    // groupByKey-per-epoch alternative re-exchanges the feature table
    // each epoch: measured 23 s/epoch vs ~1 s at 1M docs)
    val exDf = examples(docs, buckets, labelSql)
      .withColumn("shard", col("doc_id") % shards)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .scopedCheckpoint()
    val ex = exDf.drop("shard").as[Example]
    val step = shards.toLong * 128L
    val w = Array.fill[Long](buckets + 1)(0L)
    var t = 0
    while (t < epochs) {
      val w0 = w.clone() // broadcast with the closure (model-scale)
      val deltas = ex.mapPartitions { it =>
        // rows arrive (shard, doc_id)-sorted; fold each shard run
        // sequentially, emit one delta vector per shard in the
        // partition (hash partitioning keeps a shard whole)
        var cur = -1L
        var ws: Array[Long] = null
        val out = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        def flush(): Unit = if (ws != null) {
          var i = 0
          while (i < ws.length) { ws(i) -= w0(i); i += 1 }
          out += ws
        }
        it.foreach { e =>
          val s = e.doc_id % shards
          if (s != cur) { flush(); cur = s; ws = w0.clone() }
          var m = 0L
          var i = 0
          while (i < e.bs.length) { m += ws(e.bs(i).toInt) * e.cs(i); i += 1 }
          if (e.y * m <= 0L) {
            i = 0
            while (i < e.bs.length) {
              ws(e.bs(i).toInt) += e.y * step * e.cs(i); i += 1
            }
          }
        }
        flush()
        out.iterator
      }.collect() // shards × (buckets+1) — model scale
      var i = 0
      while (i < w.length) {
        var s = 0L
        deltas.foreach(d => s += d(i))
        w(i) += s / shards // exact: every delta is a multiple of shards
        i += 1
      }
      t += 1
    }
    // release OUR checkpoint only — releaseAll() here would tear down
    // sibling operators' live checkpoints when trained inside a
    // composition
    CheckpointScope.release(exDf)
    w
  }

  /** The trained model as a relation: `(bucket, wgt)`. */
  def model(spark: SparkSession, w: Array[Long]): DataFrame = {
    import spark.implicits._
    w.zipWithIndex.map { case (v, b) => (b.toLong, v) }
      .toSeq.toDF("bucket", "wgt")
  }

  /**
   * Score every document under a weight vector: integer margin,
   * `pred = sign` (ties negative), label, correctness flag. One pass,
   * one exchange on `doc_id`; the model rides as a literal array —
   * no join for the model side.
   */
  def score(docs: DataFrame, w: Array[Long], buckets: Int = Buckets,
            labelSql: String = LabelSql): DataFrame = {
    val wLit = typedLit(w.toSeq)
    docs.select(col("doc_id"), expr(labelSql).as("y"),
        TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("y"),
        explode(expr(s"array_append(transform(ws, t -> ${bucketSpark(buckets)}), cast($buckets as bigint))"))
          .as("bucket"))
      .groupBy("doc_id", "y")
      .agg(sum(element_at(wLit, (col("bucket") + 1).cast("int"))).as("margin"))
      .select(col("doc_id"), col("margin"),
        when(col("margin") > 0, 1).otherwise(-1).cast("int").as("pred"),
        col("y").cast("int").as("label"))
      .withColumn("correct", (col("pred") === col("label")).cast("int"))
  }

  /**
   * STATELESS margin column over a token-array column — the streaming
   * formulation of [[score]]'s margin: a pure per-row fold
   * (`aggregate` over the hashed tokens, bias as the init value), no
   * groupBy, so it drops into an append-mode stream or any projection
   * unchanged. Bit-identical to the aggregate form (integer sums
   * commute).
   */
  def marginExpr(wsCol: String, w: Array[Long],
                 buckets: Int = Buckets): org.apache.spark.sql.Column = {
    val wLit = typedLit(w.toSeq)
    aggregate(
      expr(s"transform($wsCol, t -> ${bucketSpark(buckets)})"),
      lit(w(buckets)),
      (acc, b) => acc + element_at(wLit, (b + 1).cast("int")))
  }

  /**
   * The DuckDB oracle: per-epoch recursive CTEs replay every shard's
   * online fold doc-by-doc (8 parallel rows per step, one per shard),
   * and a plain mixing CTE between epochs takes the exact scaled
   * average — the unrolled-epoch pattern of the BPE oracle, with the
   * doc-walk recursion of the pack_bestfit oracle. Returns the CTE
   * chain ending in `mix$epochs (w)`; append a SELECT against it.
   */
  def oracleCore(buckets: Int = Buckets, shards: Int = Shards,
                 epochs: Int = Epochs): String = {
    val n = buckets + 1
    val head =
      s"""WITH RECURSIVE dw AS (SELECT doc_id, $LabelSql AS y,
    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents),
tok AS (SELECT doc_id, y, ${bucketDuck(buckets)} AS bucket
  FROM (SELECT doc_id, y, unnest(ws) AS t FROM dw)),
bl AS (SELECT doc_id, y, list(bucket) AS bs FROM tok GROUP BY doc_id, y),
vecs AS MATERIALIZED (SELECT doc_id, doc_id % $shards AS shard,
    CAST(row_number() OVER (PARTITION BY doc_id % $shards ORDER BY doc_id) AS BIGINT) AS rn,
    y, list_append(list_transform(range(0, $buckets),
      i -> CAST(len(list_filter(bs, b -> b = i)) AS BIGINT)), CAST(1 AS BIGINT)) AS x
  FROM bl),
mix0 AS (SELECT list_transform(range(0, $n), i -> CAST(0 AS BIGINT)) AS w)"""
    val rounds = (1 to epochs).map { t =>
      s"""ep$t(shard, step, w) AS (
  SELECT CAST(s.range AS BIGINT), CAST(0 AS BIGINT), m.w FROM range(0, $shards) s, mix${t - 1} m
  UNION ALL
  SELECT e.shard, e.step + 1,
    CASE WHEN d.y * list_sum(list_transform(range(1, ${n + 1}), i -> e.w[i] * d.x[i])) <= 0
      THEN list_transform(range(1, ${n + 1}), i -> e.w[i] + d.y * ${shards * 128} * d.x[i])
      ELSE e.w END
  FROM ep$t e JOIN vecs d ON d.shard = e.shard AND d.rn = e.step + 1),
fin$t AS MATERIALIZED (SELECT w FROM (
  SELECT e.w, row_number() OVER (PARTITION BY e.shard ORDER BY e.step DESC) AS rk
  FROM ep$t e) WHERE rk = 1),
mix$t AS MATERIALIZED (SELECT list(v ORDER BY i) AS w FROM (
  SELECT r.range AS i, CAST(sum(f.w[r.range]) // $shards AS BIGINT) AS v
  FROM fin$t f, range(1, ${n + 1}) r GROUP BY r.range))"""
    }
    (head +: rounds).mkString(",\n")
  }
}
