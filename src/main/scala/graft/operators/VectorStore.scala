package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialized ANN (IVF) index store — the [[PostingsStore]] discipline
 * on the VECTOR surface: the deterministic IVF index
 * ([[Similarity.ivfCentroids]] seeds, optional integer-Lloyd refine,
 * fused-argmax assignment) built ONCE and written to parquet, so every
 * retrieval serves from a probe-prunable table instead of re-assigning
 * the corpus per query batch (at 100 TB the assignment pass IS the
 * expensive half — one fused scan, amortized over every query served).
 *
 * Layout: `path/centroids` = the (metadata-scale) `(centroid_id, v)`
 * table, one file; `path/assign` = `(vec_id, centroid_id, v)`
 * CENTROID-RANGE-CLUSTERED (`repartitionByRange(centroid_id, vec_id)` +
 * in-partition sort), so each file owns a contiguous cell range and a
 * query batch's probe set prunes whole files by footer min/max — the
 * z-ordered point store's bucket pruning, cell-id-shaped.
 *
 * Serving replays [[Similarity.ivfServe]] — the EXACT plan
 * [[Similarity.ivfTopK]] runs after its on-the-fly assignment — over
 * the stored table, so store-served results are bit-equal by
 * construction (`ann_store_equiv` gates it end-to-end); the one
 * addition is the probe-cell PRE-FILTER: the query batch's distinct
 * probe cells (driver-bounded by the centroid count) are inlined as a
 * pushable `centroid_id IN (...)` predicate ahead of the probe join,
 * which the join spelling alone cannot push into the scan.
 * The FILTERED variant composes a metadata predicate the same
 * pre-filter way ([[Similarity.ivfFilteredTopK]]'s contract: one
 * full-corpus index serves every predicate).
 */
object VectorStore {

  /** Build the store at `path` (overwrites both trees). */
  def build(emb: DataFrame, path: String, nCentroids: Int = 0,
            lloydIters: Int = 0): Unit = {
    val s = emb.sparkSession
    val seeds = Similarity.ivfCentroids(emb,
      Similarity.resolveCentroids(emb, nCentroids))
    val cents =
      if (lloydIters > 0) Similarity.ivfRefine(emb, seeds, lloydIters) else seeds
    import s.implicits._
    cents.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("centroid_id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.ivfAssign(emb, cents)
      .repartitionByRange(col("centroid_id"), col("vec_id"))
      .sortWithinPartitions("centroid_id", "vec_id")
      .write.mode("overwrite").parquet(s"$path/assign")
  }

  /** The stored centroid table, driver-side (model-scale by the IVF
    * contract — the same collect [[Similarity.ivfCentroids]] performs
    * at build time). */
  def centroids(s: SparkSession, path: String): Seq[(Int, Array[Long])] =
    s.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq

  /** [[Similarity.ivfTopK]] served from the store. */
  def topK(s: SparkSession, path: String, queries: DataFrame, k: Int,
           nProbe: Int = 4): DataFrame =
    serve(s, path, queries, k, nProbe, None)

  /** [[Similarity.ivfFilteredTopK]] served from the store: the stored
    * full-corpus index answers a metadata-restricted query (pre-filter
    * strategy — the predicate prunes the assignment scan, the probe
    * list is unchanged). */
  def filteredTopK(s: SparkSession, path: String, queries: DataFrame,
                   k: Int, pred: Column, nProbe: Int = 4): DataFrame =
    serve(s, path, queries, k, nProbe, Some(pred))

  private def serve(s: SparkSession, path: String, queries: DataFrame,
                    k: Int, nProbe: Int, pred: Option[Column]): DataFrame = {
    val cents = centroids(s, path)
    // the query batch's distinct probe cells, inlined as ONE pushable
    // IN predicate: the cell-range-clustered files outside it never
    // open (footer stats). Driver-bounded: ≤ min(|queries|·nProbe,
    // |centroids|) ints — query-log × model scale, never corpus scale.
    val cells = queries
      .select(explode(Similarity.probeCells(cents, nProbe)).as("centroid_id"))
      .distinct().collect().map(_.getInt(0))
    val assigned0 = s.read.parquet(s"$path/assign")
      .filter(col("centroid_id").isInCollection(cells))
    val assigned = pred.map(assigned0.filter).getOrElse(assigned0)
    Similarity.ivfServe(assigned, cents, queries, k, nProbe)
  }

  /** Drop the store. */
  def drop(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}
