// Round-16 scale probes for the round-15 families the README table
// lacked ≥1M-row evidence for: the postings store (1M-doc build +
// served-vs-direct query latency), incremental connected components
// (2M-vertex prior, batch fold vs full re-flood), and the bounded
// relaxations (10M-edge cheapest paths + temporal reach).
// Run on a QUIET host, single-line statements only:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r16_scale.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }

// --- postings store: 1M docs x 20 words over a 50k-term vocabulary
val docs = spark.range(1000000L).select(col("id").as("doc_id"), expr("concat_ws(' ', transform(sequence(0, 19), i -> concat('w', (id * 31 + i * 7919) % 50000)))").as("text")).localCheckpoint()
val store = "/tmp/probe_r16_store"
graft.operators.PostingsStore.drop(spark, store)
time("postings build 1M docs x 20 terms")(graft.operators.PostingsStore.build(docs, store))
val qs = spark.range(8L).select(col("id").as("query_id"), expr("concat_ws(' ', concat('w', (id * 977) % 50000), concat('w', (id * 977 + 13) % 50000), concat('w', (id * 977 + 29) % 50000))").as("qtext")).localCheckpoint()
val served1 = time("served bm25DocTopK (8 queries, cold read)")(graft.operators.PostingsStore.bm25DocTopK(spark, store, qs, 10).count)
val served2 = time("served bm25DocTopK (8 queries, warm)")(graft.operators.PostingsStore.bm25DocTopK(spark, store, qs, 10).count)
val direct = time("direct bm25DocTopK (tokenize from scratch)")(graft.operators.TextAnalysis.bm25DocTopK(qs, docs, 10).count)
println(s"[probe] rows served=$served1/$served2 direct=$direct")
graft.operators.PostingsStore.drop(spark, store)
graft.operators.CheckpointScope.releaseAll()

// --- incremental CC: moved to tools/probe_r16_cc.scala (this file's
// original section passed src/dst edges where Dedup.connectedComponents
// expects id_a/id_b and died on resolution)

// --- bounded relaxations: 10M directed edges, 6 rounds
val ev = spark.range(1000000L)
val re = (1 to 10).map(j => ev.select(col("id").as("src"), ((col("id") * 9973 + lit(j * 131071)) % 1000000L).as("dst"), ((col("id") + j) % 97 + 1).as("w"))).reduce(_ unionByName _).localCheckpoint()
println(s"[probe] edges: ${re.count}")
val seeds = spark.range(1000L).select((col("id") * 997).as("v"))
val cp = time("cheapestPaths 10M edges / 1k seeds / 6 rounds")(graft.operators.LinkGraph.cheapestPaths(re, seeds, 6).agg(count(lit(1)), sum("cost")).collect()(0))
println(s"[probe] reached=${cp.getLong(0)} cost_sum=${cp.getLong(1)}")
graft.operators.CheckpointScope.releaseAll()
val te = re.select(col("src"), col("dst"), ((col("src") * 7 + col("dst")) % 1000L).as("t")).localCheckpoint()
val tr = time("temporalReach 10M edges / 1k seeds / 6 rounds")(graft.operators.LinkGraph.temporalReach(te, seeds, 0L, 6).agg(count(lit(1)), sum("arr")).collect()(0))
println(s"[probe] reached=${tr.getLong(0)} arr_sum=${tr.getLong(1)}")
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
