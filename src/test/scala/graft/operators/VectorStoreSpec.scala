package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorStoreSpec extends SparkSpec {

  private def fixture = {
    // 200 deterministic 8-dim integer vectors with mild cluster
    // structure (id-band offsets), queries = the first 5
    val e = spark.range(200).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), j -> cast((id * 31 + j * 7) % 97 + div(id, 50) * 100 as bigint))").as("v"))
    (e, e.filter(col("vec_id") < 5))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("store-served IVF equals from-scratch, plain and filtered; probe cells push to the scan") {
    val (e, qs) = fixture
    val tmp = java.nio.file.Files.createTempDirectory("graft-vstore-spec").toString
    VectorStore.build(e, tmp, nCentroids = 8)
    val direct = rows(Similarity.ivfTopK(e, qs, 5, nCentroids = 8, nProbe = 2))
    val served = VectorStore.topK(spark, tmp, qs, 5, nProbe = 2)
    assert(rows(served) === direct)
    assert(direct.nonEmpty)
    // the query batch's probe cells reach the assignment scan as ONE
    // pushable IN predicate — the cell-range-clustered files outside
    // the probed set never open (the join spelling alone cannot push)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("/assign"), plan)
    assert(plan.contains("In(centroid_id"), plan)
    // filtered serving composes the metadata predicate the same way
    val fpred = col("vec_id") % 3 === 1
    val directF = rows(Similarity.ivfFilteredTopK(e, qs, 5, fpred, nCentroids = 8, nProbe = 2))
    assert(rows(VectorStore.filteredTopK(spark, tmp, qs, 5, fpred, nProbe = 2)) === directF)
    assert(directF !== direct)
    VectorStore.drop(spark, tmp)
    assert(!new java.io.File(tmp).exists())
  }

  test("a refined (Lloyd) store serves the refined pipeline bit-equal") {
    val (e, qs) = fixture
    val tmp = java.nio.file.Files.createTempDirectory("graft-vstore-spec2").toString
    VectorStore.build(e, tmp, nCentroids = 8, lloydIters = 1)
    val direct = rows(Similarity.ivfTopK(e, qs, 5, nCentroids = 8, nProbe = 2, lloydIters = 1))
    assert(rows(VectorStore.topK(spark, tmp, qs, 5, nProbe = 2)) === direct)
    VectorStore.drop(spark, tmp)
  }
}
