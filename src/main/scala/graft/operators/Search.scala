package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact phrase search over the document corpus via a POSITIONAL
 * inverted index — the retrieval companion to [[TextAnalysis.bm25DocTopK]]
 * (bag-of-words ranking) for queries where token ORDER matters:
 * quoted-phrase search, exact-quote decontamination probes, citation
 * mining.
 *
 * Algorithm (the classic positional-postings intersection, folded into
 * one join + one aggregate): explode documents into positioned
 * postings `(doc, p, term)` and each query phrase into ordinals
 * `(query, i, term)`; every posting matching the query's i-th term
 * votes for anchor `p − i` (the phrase's would-be start), and an
 * anchor collecting ALL `len` distinct ordinals is an occurrence.
 * Length-agnostic — a 2-token and a 12-token phrase run the same plan.
 *
 * Scale shape: the corpus side is exploded ONCE and never shuffled —
 * the query side (query-log scale, orders of magnitude below the
 * corpus) is broadcast into the postings scan, so matching is map-side;
 * the only exchange is the candidate rollup keyed on
 * `(query, doc, anchor)`, whose size is Σ_i df(query term i) — linear
 * in the matched postings, never corpus-wide. For adversarial
 * stopword-heavy phrases the standard refinement is rarest-term
 * anchoring (probe only the min-df term's postings, then verify by
 * position lookups); the uniform-ordinal join keeps the plan
 * single-pass and is the right default while query counts are small.
 */
object Search {

  /**
   * Occurrences of each query phrase in each document.
   *
   * `queries`: `(query_id, phrase)`; `docs`: `(doc_id, text)`. Both
   * sides tokenize with the engine's canonical whitespace tokenizer
   * ([[TextAnalysis.tokens]]), so a phrase matches exactly when its
   * normalized token run appears contiguously in the document.
   *
   * Output: `(query_id, doc_id, n_occ, first_pos)` — one row per
   * matching (query, document), `first_pos` the 0-based token offset
   * of the earliest occurrence.
   */
  def phraseOccurrences(queries: DataFrame, docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col("text"))).as(Seq("p", "term")))
    val qtok = queries.select(col("query_id"),
      posexplode(TextAnalysis.tokens(col("phrase"))).as(Seq("i", "term")))
    val qlen = queries.select(col("query_id"),
      size(TextAnalysis.tokens(col("phrase"))).as("len"))
    val anchors = toks.join(broadcast(qtok), "term")
      .select(col("query_id"), col("doc_id"),
        (col("p").cast("long") - col("i")).as("anchor"), col("i"))
    // plain count == distinct-ordinal count here: for a fixed
    // (query, doc, anchor), ordinal i can only match at position
    // anchor + i, and document positions are unique — so no
    // distinct-expansion pass is needed in the rollup
    anchors
      .groupBy(col("query_id"), col("doc_id"), col("anchor"))
      .agg(count(lit(1)).as("n_ordinals"))
      .join(broadcast(qlen), "query_id")
      .filter(col("n_ordinals") === col("len"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("anchor")).as("first_pos"))
  }
}
