package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Similarity-search query inventory over `embeddings` (LLM-pipeline
 * extension). Oracle-gated paths use fixed-point integer arithmetic
 * (exact in any engine/order); the LSH path is registered without an
 * oracle (approximate by design) and its recall is pinned by
 * `SimilaritySpec` under a fixed seed.
 */
object EmbeddingQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Similarity.intEmbeddings(s.read.parquet(s"$dir/embeddings.parquet"))

  private val K = 10
  private val NQueries = 10
  private val NearDupMinDot = 350000000000L // ~cosine 0.35 at unit norms
  private val Dim = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact ANN baseline: top-k by integer inner product, per query
    "ann_topk_ip" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ipTopK(e, e.filter(col("vec_id") < NQueries), K)
    }),
    // blocked embedding near-dup pairs
    "emb_near_pairs" -> ((s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), NearDupMinDot)),
    // approximate ANN: LSH buckets + exact re-rank (no oracle — the
    // candidate set is approximate by construction; recall is pinned in
    // SimilaritySpec against the exact baseline)
    "ann_lsh_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < NQueries), Dim, K,
        queriesWithinEmb = Some(col("vec_id") < NQueries))
    })
  )

  /** Shared oracle CTE: fixed-point embeddings + positional expansion. */
  private val intCte =
    """ie AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v FROM embeddings),
iex AS (SELECT vec_id, label, unnest(v) AS ev, generate_subscripts(v, 1) AS i FROM ie)"""

  val oracle: Map[String, String] = Map(
    "ann_topk_ip" ->
      s"""WITH $intCte,
p AS (SELECT a.vec_id AS qid, b.vec_id AS nid, CAST(sum(a.ev * b.ev) AS BIGINT) AS dot
  FROM iex a JOIN iex b ON a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < $NQueries GROUP BY 1, 2)
SELECT qid, nid, dot, rank FROM (
  SELECT qid, nid, dot,
    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
  FROM p)
WHERE rank <= $K""",

    "emb_near_pairs" ->
      s"""WITH $intCte,
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(sum(a.ev * b.ev) AS BIGINT) AS dot
  FROM iex a JOIN iex b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY 1, 2)
SELECT id_a, id_b, dot FROM p WHERE dot >= $NearDupMinDot"""
  )
}
