// Scale probe for the round-7 curation operators: replicate the sf0.1
// documents table to ~1M rows (id-shifted copies — same text statistics,
// 200x the mass) and measure decontaminate / packOffsets / budgetSelect /
// incrementalKeepers wall time on local[32]. Results go into README.md's
// measured-scale notes. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.parquet.int96RebaseModeInRead=CORRECTED \
//     --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar \
//     -I tools/probe_curation_scale.scala 2>/dev/null
import org.apache.spark.sql.functions._
val docs = spark.read.option("int96AsTimestamp", "true").parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text", "lang", "source")
val copies = 200
val big = docs.crossJoin(spark.range(copies).toDF("rep")).select((col("doc_id") + col("rep") * lit(1000000L)).as("doc_id"), col("text"), col("lang"), col("source")).repartition(64).cache()
val n = big.count()
println(s"PROBE corpus rows: $n")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"PROBE $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val evalPred = expr("cast(conv(substr(md5(concat('eval:', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 1000 < 20")
time("decontaminate 1M docs (2% eval, k=5)") { println(graft.operators.Curation.decontaminate(big.filter(!evalPred), big.filter(evalPred), 5).filter(col("contaminated") === 1).count()) }
time("packOffsets 1M docs (1024 shards, L=2048)") { println(graft.operators.Curation.packOffsets(big, 1024, 2048).agg(max("seq_idx")).head.getLong(0)) }
time("budgetSelect 1M docs (10M-token budget)") { println(graft.operators.Curation.budgetSelect(big, 10000000L).count()) }
val newBatch = big.filter(col("doc_id") % 100 === 37)
val prior = big.filter(col("doc_id") % 100 =!= 37)
time("incrementalKeepers 10k new vs 990k prior") { println(graft.operators.Dedup.incrementalKeepers(newBatch, prior).count()) }
time("winnowFingerprints 1M docs (k=5, w=4)") { println(graft.operators.TextAnalysis.winnowFingerprints(big).count()) }
// the 200x-replicated corpus is the boilerplate worst case: every
// fingerprint's df is ~200 > maxDf, so the cap must keep the pair
// join bounded (and near-empty) instead of exploding quadratically
time("winnowPairs 1M docs (df-capped worst case)") { println(graft.operators.TextAnalysis.winnowPairs(big, 5, 4, 3, 100).count()) }
time("tfidfTopK 1M docs (top 5)") { println(graft.operators.TextAnalysis.tfidfTopK(big, 5).count()) }
time("tokenPieces 1M docs") { println(graft.operators.TextAnalysis.tokenPieces(big).agg(sum("n_pieces")).head.getLong(0)) }
System.exit(0)
