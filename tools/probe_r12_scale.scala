// Scale probes for the round-12 changes.
//
// 1. Best-fit packing with ALL documents hashed to ONE shard — the
//    adversarial shape for the placement loop: 1M docs in a single
//    flatMapGroups fold. The round-11 linear best-fit scan was
//    O(bins) per placement (quadratic per shard); the TreeMap floor
//    lookup is O(log B), so this must finish in seconds.
// 2. PageRank with dangling-mass redistribution at 2M vertices / 6M
//    edges — same two-shuffle iteration as the base variant plus a
//    1-row dangling aggregate per round.
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r12_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
import spark.implicits._
// --- 1. packBestFit, 1M docs forced into one shard (nShards = 1) ---
val docs1m = spark.range(1000000).select(col("id").as("doc_id"), expr("repeat('tok ', cast(8 + (id * 2654435761) % 120 as int))").as("text")).cache()
println(s"[probe] docs=${docs1m.count()}")
val packed = time("packBestFit 1M docs -> 1 shard (seqLen 2048)") { val p = graft.operators.Curation.packBestFit(docs1m, 1, 2048).cache(); println(s"[probe] placements=${p.count()}"); p }
time("packPadding audit") { graft.operators.Curation.packPadding(packed, 2048).show(5, false) }
packed.unpersist(); docs1m.unpersist()
// --- 2. PageRank + dangling redistribution, 2M vertices / 6M edges ---
val nv = 2000000L
val vb = spark.range(nv).select(col("id").as("doc_id")).crossJoin(spark.range(1).select(lit(nv).as("nn")))
val ed = vb.select(col("doc_id").as("src"), ((col("doc_id")*col("doc_id")+7) % col("nn")).as("dst")).unionByName(vb.select(col("doc_id").as("src"), ((col("doc_id")*31+7) % col("nn")).as("dst"))).unionByName(vb.select(col("doc_id").as("src"), (col("doc_id") % 1000).as("dst")))
// drop out-edges of every 5th vertex to create real dangling mass
val edges = ed.filter(col("src") % 5 =!= 0).cache()
println(s"[probe] edges=${edges.count()}")
time("pageRank 2M vertices, 5 iters, dangling redistribution") { println(graft.operators.LinkGraph.pageRank(edges, iters = 5, redistributeDangling = true).agg(sum(col("rank"))).head()) }
time("pageRankDelta (convergence probe), same graph") { println(graft.operators.LinkGraph.pageRankDelta(edges, iters = 5, redistributeDangling = true).head()) }
edges.unpersist()
