package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fuzzy record linkage (entity resolution across tables) with
 * DELETION-NEIGHBORHOOD blocking — the SymSpell trick (Garbe 2012,
 * itself the FastSS scheme of Bocek et al. 2007): two strings within
 * edit distance 1 always share a member of their 1-deletion
 * neighborhoods (each string plus every single-character deletion of
 * it), so emitting `len + 1` blocking keys per string turns the fuzzy
 * match into an EXACT equi-join, with `levenshtein` verifying the
 * survivors. No length-band cross products, no all-pairs anywhere.
 *
 * Scale shape: each side expands to O(avg_len) keys per record — a
 * bounded, map-side explode — and the only exchange is the equi-join
 * on the neighborhood key. Candidate count is bounded by genuinely
 * colliding neighborhoods (near-identical strings), not by table
 * sizes; the verify filter runs before the distinct. A very common
 * key (many records sharing a near-identical name) degrades to that
 * key's own match volume — which is output, not overhead.
 */
object RecordLinkage {

  /** `s` plus every single-character deletion of `s`, as one array
    * column (the ed-1 blocking neighborhood). */
  private def deletionKeys(s: String) = expr(
    s"array_union(array($s), transform(sequence(1, length($s)), " +
      s"i -> concat(substring($s, 1, i - 1), substring($s, i + 1, length($s)))))")

  /**
   * Link `left (id_l, name_l)` to `right (id_r, name_r)`: all pairs
   * with `levenshtein(name_l, name_r) <= 1`, exact matches included.
   * Output: `(id_l, name_l, id_r, name_r, dist)`.
   */
  def linkEd1(left: DataFrame, right: DataFrame): DataFrame = {
    val lk = left.select(col("id_l"), col("name_l"),
      explode(deletionKeys("name_l")).as("bk"))
    val rk = right.select(col("id_r"), col("name_r"),
      explode(deletionKeys("name_r")).as("bk"))
    lk.join(rk, "bk")
      .withColumn("dist", levenshtein(col("name_l"), col("name_r")))
      .filter(col("dist") <= 1)
      .select(col("id_l"), col("name_l"), col("id_r"), col("name_r"),
        col("dist").cast("long").as("dist"))
      .distinct()
  }

  /** DuckDB twin of [[deletionKeys]] over column expression `c`. */
  def deletionKeysSql(c: String): String =
    s"list_distinct(list_prepend($c, list_transform(range(1, length($c) + 1), " +
      s"i -> substr($c, 1, i - 1) || substr($c, i + 1))))"
}
