package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Token co-occurrence / PMI mining over the document corpus — the
 * word-association statistic (Church & Hanks 1990) that seeds
 * collocation dictionaries, topic seeds, and embedding sanity checks.
 * `pmi(a,b) = log p(a,b) / (p(a)·p(b))` over document-level
 * occurrence; reported here as the exact integer ratio
 * `ratio_e4 = n_ab·n_docs·10^4 / (n_a·n_b)` (PMI is monotone in it,
 * and the integer form hash-matches the DuckDB replay — no floating
 * log).
 *
 * The quadratic door (all token pairs per document) is closed by
 * restricting to the corpus's TOP-N terms by document frequency: the
 * pair explode is then ≤ N²/2 per document regardless of document
 * length or vocabulary size, and N is a knob (association mining over
 * the long tail is a different query — run per-shard vocabularies).
 *
 * Scale shape: one distinct-occurrence exchange (doc, term), one
 * df rollup, a TakeOrderedAndProject top-N (never a full sort), the
 * top-term set BROADCAST back as a semi-join filter, and one
 * co-partitioned self-join on doc_id over the filtered (≤ N per doc)
 * occurrences.
 */
object Cooccur {

  /**
   * Document-level PMI pairs over the `topN`-term vocabulary.
   * Output: `(term_a, term_b, n_ab, n_a, n_b, ratio_e4)` for pairs
   * with `n_ab >= minPairCount`, `term_a < term_b`.
   */
  def pmiPairs(docs: DataFrame, topN: Int, minPairCount: Long): DataFrame = {
    val occ = docs.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val df = occ.groupBy("term").agg(count(lit(1)).as("n_t"))
    val top = df.orderBy(col("n_t").desc, col("term")).limit(topN)
    val focc = occ.join(broadcast(top), "term")
      .select(col("doc_id"), col("term"), col("n_t"))
    val pairs = focc.as("x").join(focc.as("y"), "doc_id")
      .filter(col("x.term") < col("y.term"))
      .groupBy(col("x.term").as("term_a"), col("y.term").as("term_b"),
        col("x.n_t").as("n_a"), col("y.n_t").as("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    // widen the numerator to DECIMAL(38,0): n_ab·n_docs·10^4 overflows
    // Long near 10^7-doc corpora (Spark would wrap silently in non-ANSI
    // mode while the oracle errors); `div` is exact integral division on
    // decimals (no HALF_UP-rounded intermediate quotient, so no round-up
    // past the integer boundary when the true fraction nears 1), and the
    // quotient itself fits BIGINT (n_ab ≤ min(n_a,n_b) bounds it by
    // n_docs·10^4)
    pairs.crossJoin(broadcast(nDocs))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("cast(cast(n_ab as decimal(38,0)) * n_docs * 10000 div (cast(n_a as decimal(38,0)) * n_b) as bigint)")
          .as("ratio_e4"))
  }
}
