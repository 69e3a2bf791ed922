// Scale probes for the round-12 session additions.
//
// 1. mmrRerankTopK: 100k queries x C=50 shortlist over a 200k-vector
//    corpus (d=32) — the greedy is per-query partition-local work
//    after one qid shuffle, so wall-clock must scale with the QUERY
//    count, never the corpus.
// 2. weightedSample: k=1000 of 20M weighted rows — TakeOrdered per-
//    partition heaps; must run as one scan, no global sort.
// 3. events_sliding shape: 20M events / 1M users, trailing-hour RANGE
//    frame — one user_id shuffle, per-user running multiset.
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r12d_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
import spark.implicits._
// --- 1. MMR greedy at query scale: 100k queries x C=50 candidates (d=32) ---
// the shortlist builder is whichever ANN path fits the corpus (ipTopK /
// ivfTopK / ivfPqRerankTopK); this probe feeds mmrRerank a synthetic
// candidate table directly and measures the novel stage: 5M candidate
// rows -> one qid shuffle -> 100k independent partition-local greedies
val cand = spark.range(5000000).select(expr("id div 50").as("qid"), (col("id") * 2654435761L % 10000000).as("nid"), (col("id") * 7919 % 1000000).as("dot"), expr("transform(sequence(0, 31), j -> cast((id * (j + 7919) * 40503) % 2000001 - 1000000 as bigint))").as("nv"))
time("mmrRerank greedy: 100k queries x C=50, k=10, d=32") {
  val r = graft.operators.Similarity.mmrRerank(cand, k = 10)
  println(s"[probe] rows=${r.count()}")
}
// --- 2. weighted priority sample: 20M docs, k=1000 ---
val docs = spark.range(20000000).select(col("id").as("doc_id"), concat(lit("w "), repeat(lit("tok "), (col("id") % 97 + 3).cast("int"))).as("text"))
time("weightedSample 20M docs k=1000") {
  val s = graft.operators.Curation.weightedSample(docs, 1000)
  println(s"[probe] sampled=${s.count()}")
}
// --- 3. sliding RANGE frame: 20M events, 1M users ---
val ev = spark.range(20000000).select(col("id").as("event_id"), (col("id") % 1000000).as("user_id"), (col("id") * 180000000000L % (86400L * 30 * 1000000000L)).as("ts"), (col("id") % 10000).as("cents"))
time("sliding 1h RANGE frame 20M events / 1M users") {
  import org.apache.spark.sql.expressions.Window
  val w = Window.partitionBy(col("user_id")).orderBy(col("ts")).rangeBetween(-3600000000000L, 0)
  val r = ev.withColumn("w_cnt", count(lit(1)).over(w)).withColumn("w_sum", sum(col("cents")).over(w))
  println(s"[probe] rows=${r.count()}")
}
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
