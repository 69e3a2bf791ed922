// Scale probe for the round-9 operators: replicate the sf0.1 documents
// table to ~1M rows (id-shifted copies) and measure spanDedup (rewritten:
// per-token hash + polynomial grams + shared checkpoint) and
// spanDedupChars; replicate embeddings to ~1M vectors and measure
// semanticIncremental (10k batch vs 990k prior, two-level IVF at
// nCentroids ~ sqrt(n)). Results go into README.md's measured-scale
// notes. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar \
//     -I tools/probe_round9_scale.scala 2>/dev/null
import org.apache.spark.sql.functions._
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text", "lang", "source")
val copies = 200
val big = docs.crossJoin(spark.range(copies).toDF("rep")).select((col("doc_id") + col("rep") * lit(1000000L)).as("doc_id"), col("text"), col("lang"), col("source")).repartition(64).cache()
val n = big.count()
println(s"PROBE corpus rows: $n")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"PROBE $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
// 200x replication is span dedup's WORST case: every gram is duplicated
// across ~200 docs, so every non-keeper document is fully covered and
// the dup-start lists carry every position
time("spanDedup 1M docs (k=5, worst-case all-duplicated)") { println(graft.operators.Dedup.spanDedup(big, 5, 2).agg(sum("n_kept")).head.getLong(0)) }
time("spanDedupChars 1M docs (k=20, worst-case all-duplicated)") { println(graft.operators.Dedup.spanDedupChars(big, 20, 2).agg(sum("n_dup_chars")).head.getLong(0)) }
val emb = graft.operators.Similarity.intEmbeddings(spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet"))
val nv = emb.count()
val vcopies = (1000000 / nv).toInt
val bigEmb = emb.crossJoin(spark.range(vcopies).toDF("rep")).select((col("vec_id") + col("rep") * lit(10000000L)).as("vec_id"), col("label"), col("v")).repartition(64).cache()
println(s"PROBE embedding rows: ${bigEmb.count()}")
val newBatch = bigEmb.filter(col("vec_id") % 100 === 37)
val prior = bigEmb.filter(col("vec_id") % 100 =!= 37)
// nCentroids ~ sqrt(n): the two-level coarse->fine assignment path
time("semanticIncremental 10k new vs 990k prior (1000 cells, nProbe=8)") { println(graft.operators.Similarity.semanticIncremental(newBatch, prior, "probe9", 350000000000L, 1000, 8).count()) }
val scores = bigEmb.select(col("vec_id"), (col("vec_id") % 1000).as("score"))
time("diversitySample 1M vectors (1000 cells, 100/cell)") { println(graft.operators.Similarity.diversitySample(bigEmb, scores, 100, 1000).count()) }
time("bpeMergeCandidates 1M docs (top 20)") { println(graft.operators.TextAnalysis.bpeMergeCandidates(big, 20).count()) }
val langBudgets = Map("en" -> 600000L, "de" -> 200000L, "fr" -> 200000L, "es" -> 250000L, "zh" -> 150000L)
time("mixtureSelect 1M docs (5 language budgets)") { println(graft.operators.Curation.mixtureSelect(big, langBudgets, "lang").count()) }
System.exit(0)
