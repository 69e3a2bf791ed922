// Stage-level timing of spanDedupCharsApprox vs spanDedupChars at the
// sf0.1 gate fixture — finds where the winnow prefilter loses to the
// exact twin at gate scale (the r15 bench inversion: 5.75 s vs 3.07 s).
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r16_winnow_stages.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r }
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))
println(s"[probe] docs=${docs.count()}")
for (i <- 1 to 3) {
  time(s"run$i spanDedupChars EXACT sf0.1") { println(graft.operators.Dedup.spanDedupChars(docs, 20, 2).agg(sum("n_dup_chars")).head.getLong(0)) }
  graft.operators.CheckpointScope.releaseAll()
  time(s"run$i spanDedupCharsApprox sf0.1") { println(graft.operators.Dedup.spanDedupCharsApprox(docs, 20, 2, 4, 1.0).agg(sum("n_dup_chars")).head.getLong(0)) }
  graft.operators.CheckpointScope.releaseAll()
}
System.exit(0)
