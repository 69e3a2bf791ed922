// Round-19 scale probe: the materialized ANN store (VectorStore) at
// 1M vectors x 64 dims (the embeddings fixture dim) —
//  - build cost (centroids + cell-range-clustered assignment + meta,
//    crash-atomic .next/_READY/swap);
//  - store-served vs from-scratch IVF top-k latency (the same serve
//    plan, modulo the stored assignment + pushed probe-cell IN);
//  - quantified row-group skipping: scan output rows for a 2-cell
//    probe over the clustered assignment vs the table's 1M rows;
//  - lifecycle costs at the same scale: appendBatch 100k, deleteVecs
//    10k, compact (fold must be result-invisible).
// Results go into README.md's measured-scale notes. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar \
//     -I tools/probe_r19_vstore.scala 2>/dev/null
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorStore}
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"PROBE $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val root = "/tmp/probe_r19_vstore"
new java.io.File(root).mkdirs()
val n = 1000000L
// 64 DIRECTIONAL clusters (vector i points along axis i%64 plus noise):
// inner-product argmax separates directions, not offsets — a scalar
// shift along the all-ones vector would collapse every row into the
// single largest-norm cell
val vexpr = "transform(sequence(0, 63), j -> cast((id * 31 + j * 7) % 97 as bigint) + (case when j = id % 64 then 5000 else 0 end))"
val raw = spark.range(n).select(col("id").as("vec_id"), expr(vexpr).as("v"))
time("write 1M x 64 int-vector corpus (64 natural clusters)") { raw.repartition(32).write.mode("overwrite").parquet(s"$root/emb") }
val emb = spark.read.parquet(s"$root/emb")
time("build VectorStore (256 centroids, clustered assignment, atomic swap)") { VectorStore.build(emb, s"$root/vstore", nCentroids = 256) }
val fsP = new org.apache.hadoop.fs.Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
println(s"PROBE assign files: ${fsP.listStatus(new org.apache.hadoop.fs.Path(s"$root/vstore/assign/base")).count(_.getPath.getName.endsWith(".parquet"))}")
val qs = emb.filter(col("vec_id") % 125000 === 0) // 8 queries
println(s"PROBE queries: ${qs.count()}")
// warm-up: one un-timed serve so neither timed path pays the JVM's
// first-ever shuffle/codegen; then min-of-2 per path (the Bench rule)
VectorStore.topK(spark, s"$root/vstore", qs, 10, nProbe = 8).collect()
def minOf2(label: String)(f: => Array[org.apache.spark.sql.Row]): Array[org.apache.spark.sql.Row] = { val t0 = System.nanoTime; val r1 = f; val s1 = (System.nanoTime - t0) / 1e9; val t1 = System.nanoTime; val r2 = f; val s2 = (System.nanoTime - t1) / 1e9; println(f"PROBE $label: ${math.min(s1, s2)}%.1f s (runs $s1%.1f / $s2%.1f)"); r2 }
val served = minOf2("store-served topK (k=10, nProbe=8), 8 queries") { VectorStore.topK(spark, s"$root/vstore", qs, 10, nProbe = 8).collect() }
val scratch = minOf2("from-scratch ivfTopK (same params, re-assigns the corpus)") { Similarity.ivfTopK(emb, qs, 10, nCentroids = 256, nProbe = 8).collect() }
println(s"PROBE served==scratch: ${served.map(_.toString).sorted.toSeq == scratch.map(_.toString).sorted.toSeq}")
// row-group skipping evidence: a 2-POPULATED-cell probe over the
// cell-range-clustered assignment — scan output rows = rows in
// surviving row groups after the pushed IN's footer-stats skip
spark.conf.set("spark.sql.adaptive.enabled", "false")
val twoCells = spark.read.parquet(s"$root/vstore/assign/base").groupBy("centroid_id").count().orderBy(desc("count")).limit(2).collect().map(_.getInt(0)).toSeq
println(s"PROBE probing the 2 fullest cells: $twoCells")
val probe = spark.read.parquet(s"$root/vstore/assign/base").filter(col("centroid_id").isInCollection(twoCells))
val pqe = probe.queryExecution
val pc = time("2-cell probe over clustered assignment") { pqe.executedPlan.execute().count() }
val scan = pqe.executedPlan.collectLeaves().collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
println(s"PROBE 2-cell probe: matched rows=$pc, scan output rows=${scan.map(_.metrics("numOutputRows").value).getOrElse(-1L)} of $n total, files listed=${scan.map(_.metrics("numFiles").value).getOrElse(-1L)}")
spark.conf.set("spark.sql.adaptive.enabled", "true")
// lifecycle at scale
val extra = spark.range(n, n + 100000L).select(col("id").as("vec_id"), expr(vexpr).as("v"))
time("appendBatch 100k vectors to the existing centroids") { VectorStore.appendBatch(extra, s"$root/vstore", 1L) }
time("deleteVecs 10k ids (marker write)") { VectorStore.deleteVecs(spark, s"$root/vstore", spark.range(0L, 1000000L, 100L).toDF("vec_id"), 2L) }
val served2 = time("store-served topK through 1 batch + 10k markers") { VectorStore.topK(spark, s"$root/vstore", qs, 10, nProbe = 8).collect() }
time("compact (fold batch + markers to one clustered base)") { VectorStore.compact(spark, s"$root/vstore") }
val served3 = time("store-served topK after compact") { VectorStore.topK(spark, s"$root/vstore", qs, 10, nProbe = 8).collect() }
println(s"PROBE compact result-invisible: ${served2.map(_.toString).sorted.toSeq == served3.map(_.toString).sorted.toSeq}")
println(s"PROBE isStale(unchanged build corpus) after the whole lifecycle: ${VectorStore.isStale(spark, s"$root/vstore", emb)}")
fsP.delete(new org.apache.hadoop.fs.Path(root), true)
System.exit(0)
