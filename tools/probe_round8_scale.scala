// Scale probe for the round-8 operators: replicate the sf0.1 documents
// table to ~1M rows (id-shifted copies) and measure segmentDedup /
// decontaminateAtScale (bloom) / incrementalKeepersAtScale (bloom) /
// gopherQuality / seqProvenance wall time on local[32]. Results go into
// README.md's measured-scale notes. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar \
//     -I tools/probe_round8_scale.scala 2>/dev/null
import org.apache.spark.sql.functions._
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text", "lang", "source")
val copies = 200
val big = docs.crossJoin(spark.range(copies).toDF("rep")).select((col("doc_id") + col("rep") * lit(1000000L)).as("doc_id"), col("text"), col("lang"), col("source")).repartition(64).cache()
val n = big.count()
println(s"PROBE corpus rows: $n")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"PROBE $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
// 200x replication is segment dedup's WORST case: every segment is
// shared by ~200 docs, so nearly the whole corpus is rewritten
time("segmentDedup 1M docs (L=10, worst-case all-shared)") { println(graft.operators.Dedup.segmentDedup(big, 10, 2).agg(sum("n_kept")).head.getLong(0)) }
val evalPred = expr("cast(conv(substr(md5(concat('eval:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 1000 < 20")
time("decontaminateAtScale 1M docs (bloom prefilter, 2% eval, k=5)") { println(graft.operators.Curation.decontaminateAtScale(big.filter(!evalPred), big.filter(evalPred), 5).filter(col("contaminated") === 1).count()) }
val newBatch = big.filter(col("doc_id") % 100 === 37)
val prior = big.filter(col("doc_id") % 100 =!= 37)
time("incrementalKeepersAtScale 10k new vs 990k prior (batch-side blooms)") { println(graft.operators.Dedup.incrementalKeepersAtScale(newBatch, prior).count()) }
time("gopherQuality 1M docs") { println(graft.operators.TextAnalysis.gopherQuality(big).agg(sum("pass")).head.getLong(0)) }
time("seqProvenance 1M docs (1024 shards, L=2048)") { println(graft.operators.Curation.seqProvenance(big, 1024, 2048).count()) }
System.exit(0)
