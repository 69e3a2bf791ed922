package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Physical-layout utilities for the 100 TB paths (SURVEY §7.3):
 *
 *  - [[writeBucketed]]: persist a relation hash-bucketed AND sorted by
 *    its join key, so repeated equi-joins/aggregations on that key plan
 *    with NO shuffle exchange on either side (the classic fact-fact
 *    co-location strategy when broadcast is impossible);
 *  - [[saltedJoin]]: explicit skew mitigation for a hot-keyed join —
 *    salt the skewed side's key into `saltFactor` sub-keys and expand
 *    the build side, bounding any single task's share of a hot key to
 *    1/saltFactor. AQE's runtime skew-join split covers most cases;
 *    this is the deterministic plan-level fallback.
 */
object ScaleLayout {

  /** Write `df` as a bucketed, sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /**
   * Equi-join `left ⋈ right` on `key` with the LEFT side salted:
   * left rows get a deterministic salt in [0, saltFactor); right rows
   * are replicated across all salts. Result equals the plain join.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    // salt from row CONTENT, not monotonically_increasing_id: mid is
    // nondeterministic across stage retries (SPARK-23207 class), which
    // could drop/duplicate rows after a shuffle-fetch failure
    val salted = left.withColumn("__salt",
      pmod(hash(struct(left.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)))
    val expanded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }
}
