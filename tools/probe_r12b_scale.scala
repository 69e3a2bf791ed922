// Scale probes for the sketch + HITS additions.
//
// 1. HLL registers + estimate over ~40M token occurrences / 10M
//    distinct — the sketch must stay one partial-aggregated shuffle of
//    m cells per partition; accuracy lands inside the 1.04/sqrt(m)
//    band.
// 2. Count-Min counters over the same corpus + point estimates for the
//    heavy keys.
// 3. HITS at 2M vertices / 6M edges, 5 iterations — same graph family
//    as the PageRank probe (two shuffles + two 1-row maxes per round).
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r12b_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
import spark.implicits._
// --- corpus: 1M docs x ~40 tokens; ~10M distinct (u<id>_<i> per doc + 31 heavy) ---
val docs10m = spark.range(1000000).select(col("id").as("doc_id"), expr("concat('alpha beta gamma delta ', concat_ws(' ', transform(sequence(0, 35), i -> concat('u', id, '_', i))))").as("text")).cache()
println(s"[probe] docs=${docs10m.count()}")
val regs = time("hllRegisters over ~40M occurrences") { val r = graft.operators.Sketches.hllRegisters(docs10m).cache(); println(s"[probe] registers=${r.count()}"); r }
time("hllEstimate") { val est = graft.operators.Sketches.hllEstimate(regs).head().getLong(0); val exact = 36000000L + 4L; println(f"[probe] est=$est exact~$exact err=${math.abs(est - exact) * 100.0 / exact}%.1f%%") }
regs.unpersist()
time("cmCounters over ~40M occurrences") { println(s"[probe] cells=${graft.operators.Sketches.cmCounters(docs10m).count()}") }
time("cmHeavyHitters top-20") { graft.operators.Sketches.cmHeavyHitters(docs10m, 20).show(5, false) }
docs10m.unpersist()
// --- HITS, 2M vertices / 6M edges, 5 iterations ---
val nv = 2000000L
val vb = spark.range(nv).select(col("id").as("doc_id")).crossJoin(spark.range(1).select(lit(nv).as("nn")))
val edges = vb.select(col("doc_id").as("src"), ((col("doc_id")*col("doc_id")+7) % col("nn")).as("dst")).unionByName(vb.select(col("doc_id").as("src"), ((col("doc_id")*31+7) % col("nn")).as("dst"))).unionByName(vb.select(col("doc_id").as("src"), (col("doc_id") % 1000).as("dst"))).cache()
println(s"[probe] edges=${edges.count()}")
time("hits 2M vertices, 5 iters") { println(graft.operators.LinkGraph.hits(edges, iters = 5).agg(max(col("auth")), max(col("hub")), count(lit(1))).head()) }
edges.unpersist()
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
