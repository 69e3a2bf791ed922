// Scale probe for LinkGraph.kTrussPeelTrace at 2M vertices — the r16
// kTruss probe's planted-kernel graph (~7M directed edges), peeled with
// the convergence TRACE: per round (peeled, surviving) counts, the
// signal a caller uses to pick `rounds` (last round peels 0 => the
// bounded result IS the k-truss). Cost over plain kTruss = one count
// per round on the already-checkpointed edge set.
// Measured (this host): 62.0 s for 5 rounds; round 1 peels 7,755,273
// edges leaving 4,676, rounds 2-5 peel 0 — the trace tells a caller
// running rounds=3 that rounds=1 already converged on this graph.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r18_ktruss_trace.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val n = 2000000L
val base = spark.range(n).select(col("id").as("src"), ((col("id") * col("id") + 7) % n).as("dst")).unionByName(spark.range(n).select(col("id").as("src"), ((col("id") * 31 + 7) % n).as("dst"))).unionByName(spark.range(n).select(col("id").as("src"), (col("id") % 25).as("dst")))
val dense = spark.range(n).filter(col("id") % 2 === 0)
val kedges = base.unionByName(dense.select(col("id").as("src"), (expr("div(id, 25) * 25") + (col("id") * 7 + 3) % 25).as("dst"))).unionByName(dense.select(col("id").as("src"), (expr("div(id, 25) * 25") + (col("id") * 11 + 5) % 25).as("dst")))
time("kTrussPeelTrace k=3 rounds=5 on 2M vertices / ~7M edges") { graft.operators.LinkGraph.kTrussPeelTrace(kedges, 3, 5).collect().foreach(r => println(s"[probe] round=${r.getLong(0)} peeled=${r.getLong(1)} surviving=${r.getLong(2)}")) }
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
