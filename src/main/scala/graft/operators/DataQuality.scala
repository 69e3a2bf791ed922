package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality auditing (the Deequ/Great-Expectations
 * shape): completeness, domain and range conformance, key uniqueness
 * and referential integrity, each reported as a named violation count
 * in one long-format table a pipeline gate can assert on. A 100 TB
 * ingest runs exactly this battery before anything downstream trusts
 * the batch.
 *
 * Scale shape: every rule family is a CONDITIONAL AGGREGATE — all of
 * a table's rules fold in ONE scan with map-side partials (no
 * per-rule passes, no shuffle wider than a 1-row result); uniqueness
 * is `count − count(distinct)` (one exchange on the key's hash);
 * referential checks are anti-join counts that broadcast when the
 * dimension is small and shuffle on the key otherwise. Nothing ever
 * materializes per-row violation lists unless a caller asks for them.
 */
object DataQuality {

  /**
   * Count each rule's violating rows in ONE pass over `df`.
   * `rules` maps check name → predicate that is TRUE when the row
   * VIOLATES the check. Output: `(check_name, n_bad)`, one row per
   * rule.
   */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    // coalesce: sum over an empty table is NULL, but an empty audit
    // (e.g. an empty replayed microbatch) must report 0 violations —
    // the oracle spelling coalesces to zero for the same reason
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(s"_c$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"'${name.replace("'", "''")}', _c$i" }
      .mkString(", ")
    one.select(expr(
      s"stack(${rules.size}, $stackArgs) as (check_name, n_bad)"))
  }

  /** `(name, n_bad)` where n_bad = rows − distinct keys (0 = unique). */
  def duplicateKeyCount(df: DataFrame, key: Column, name: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(key)).as("n_bad"))
      .select(lit(name).as("check_name"), col("n_bad"))

  /**
   * Referential integrity: fact rows whose `factKey` has no match in
   * `dim.dimKey`. Anti-join count — broadcast the dimension when
   * small, hash-shuffle on the key otherwise (Catalyst's choice).
   */
  def orphanCount(fact: DataFrame, factKey: Column,
                  dim: DataFrame, dimKey: Column, name: String): DataFrame =
    fact.join(dim, factKey === dimKey, "left_anti")
      .agg(count(lit(1)).as("n_bad"))
      .select(lit(name).as("check_name"), col("n_bad"))

  /** Union of audit fragments into the one report table. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_.unionByName(_))
}
