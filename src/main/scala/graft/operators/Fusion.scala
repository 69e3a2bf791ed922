package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rank fusion for hybrid retrieval — combining a lexical ranking
 * (BM25, [[TextAnalysis.bm25DocTopK]]) with a semantic one (ANN over
 * embeddings, [[Similarity.ipTopK]]) is how production search serves
 * both exact-term and paraphrase matches. Reciprocal Rank Fusion
 * (Cormack, Clarke & Buettcher 2009): a document's fused score is
 * `Σ_lists 1/(k + rank)` over every list that retrieved it — computed
 * here as the exact integer `1e6 div (k + rank)` so the fused scores
 * and the final ordering hash-match a DuckDB replay. RRF needs no
 * score calibration between lists (only ranks enter), which is why it
 * fuses a fixed-point BM25 score and an integer dot product without
 * any normalization step.
 *
 * Scale shape: inputs are top-k lists — `k · |queries|` rows each,
 * query-log scale, NOT corpus scale — so the union + one
 * `(query_id, doc_id)` aggregation + per-query window are all cheap
 * regardless of corpus size; the heavy lifting happened inside the
 * per-list retrievers, which never materialize beyond their own top-k.
 */
object Fusion {

  /** Fixed-point scale of one reciprocal-rank unit. */
  val RrfScaleE6 = 1000000L

  /** The standard RRF dampening constant. */
  val RrfK = 60

  /**
   * Fuse ranked lists, each `(query_id, doc_id, rank)` with rank
   * 1-based, into the top-`topK` per query:
   * `(query_id, doc_id, rrf_e6, n_lists, rank)` — `n_lists` = how many
   * input lists retrieved the document; ties break by ascending
   * `doc_id` (pinned in both engines).
   */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = RrfK,
              topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty)
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      expr(s"$RrfScaleE6 div ($kRrf + rank)").as("contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("rrf_e6"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_e6").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "rrf_e6", "n_lists", "rank")
  }
}
