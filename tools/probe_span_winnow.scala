// Scale probe for spanDedupApprox vs spanDedup at ~1M docs, three regimes:
//  (c) 5%-DUP (the operator's target): 95% of docs get every token salted
//      by (doc,rep) — globally unique content; 5% keep their raw text, so
//      their replicas are exact/near dups. Candidates ≈ 5% → the
//      positioned join collapses and the prefilter should win.
//  (a) SF0.1-STRUCTURE: every token salted by the replica id only —
//      cross-replica grams never collide, each replica keeps sf0.1's
//      natural (high) dup fraction. Candidates are most docs: expect par.
//  (b) ALL-NEAR-DUP (adversarial): texts distinct only by one appended
//      unique token — every doc is a candidate, approx degrades to
//      exact + the winnow pass (the documented non-win).
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_span_winnow.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))
val n = docs.count()
val copies = math.max(1, (1000000 / n).toInt)
println(s"[probe] base docs=$n copies=$copies")
val fivepct = docs.crossJoin(spark.range(copies).toDF("rep")).select((col("doc_id") + col("rep") * lit(10000000L)).as("doc_id"), when(col("doc_id") % 20 === 0, col("text")).otherwise(array_join(transform(split(col("text"), " "), t => concat(t, lit("~d"), col("doc_id") + col("rep") * lit(10000000L))), " ")).as("text")).repartition(64).cache()
println(s"[probe] 5pct-dup rows=${fivepct.count()}")
time("spanDedup  EXACT  5pct-dup 1M") { println(graft.operators.Dedup.spanDedup(fivepct, 5, 2).agg(sum("n_kept")).head.getLong(0)) }
time("spanDedupApprox   5pct-dup 1M") { println(graft.operators.Dedup.spanDedupApprox(fivepct, 5, 2, 4).agg(sum("n_kept")).head.getLong(0)) }
time("spanDedupChars  EXACT  5pct-dup 1M") { println(graft.operators.Dedup.spanDedupChars(fivepct, 20, 2).agg(sum("n_dup_chars")).head.getLong(0)) }
time("spanDedupCharsApprox   5pct-dup 1M") { println(graft.operators.Dedup.spanDedupCharsApprox(fivepct, 20, 2, 4).agg(sum("n_dup_chars")).head.getLong(0)) }
fivepct.unpersist()
val distinct1m = docs.crossJoin(spark.range(copies).toDF("rep")).select((col("doc_id") + col("rep") * lit(10000000L)).as("doc_id"), array_join(transform(split(col("text"), " "), t => concat(t, lit("~r"), col("rep"))), " ").as("text")).repartition(64).cache()
println(s"[probe] mostly-distinct rows=${distinct1m.count()}")
time("spanDedup  EXACT  mostly-distinct 1M") { println(graft.operators.Dedup.spanDedup(distinct1m, 5, 2).agg(sum("n_kept")).head.getLong(0)) }
time("spanDedupApprox   mostly-distinct 1M") { println(graft.operators.Dedup.spanDedupApprox(distinct1m, 5, 2, 4).agg(sum("n_kept")).head.getLong(0)) }
distinct1m.unpersist()
val neardup1m = docs.crossJoin(spark.range(copies).toDF("rep")).select((col("doc_id") + col("rep") * lit(10000000L)).as("doc_id"), concat(col("text"), lit(" uniq"), (col("doc_id") + col("rep") * lit(10000000L)).cast("string")).as("text")).repartition(64).cache()
println(s"[probe] all-near-dup rows=${neardup1m.count()}")
time("spanDedup  EXACT  all-near-dup 1M") { println(graft.operators.Dedup.spanDedup(neardup1m, 5, 2).agg(sum("n_kept")).head.getLong(0)) }
time("spanDedupApprox   all-near-dup 1M") { println(graft.operators.Dedup.spanDedupApprox(neardup1m, 5, 2, 4).agg(sum("n_kept")).head.getLong(0)) }
neardup1m.unpersist()
System.exit(0)
