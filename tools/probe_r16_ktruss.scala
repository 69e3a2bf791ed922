// Scale probe for LinkGraph.kTruss at 2M vertices — the k-core probe's
// planted-kernel graph (tools/probe_r12e_scale.scala: quadratic +
// affine + hub maps everywhere, two dense intra-25-block maps on the
// even half, ~7M directed edges), 3 bounded support-peel rounds at k=3.
// Each round is one degree-ordered triangle enumeration over the
// SHRINKING edge set + an edge-keyed support aggregate — the wedge
// bound, not the raw degree, is what keeps the hub vertices (every
// page links one of the first 25) from a quadratic blowup.
// Measured (this host): 86.0 s, 4676 surviving edges (support_sum
// 6942) — the dense planted blocks survive, the triangle-poor base
// maps peel despite their high degrees (the k-core keeps them).
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r16_ktruss.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val n = 2000000L
val base = spark.range(n).select(col("id").as("src"), ((col("id") * col("id") + 7) % n).as("dst")).unionByName(spark.range(n).select(col("id").as("src"), ((col("id") * 31 + 7) % n).as("dst"))).unionByName(spark.range(n).select(col("id").as("src"), (col("id") % 25).as("dst")))
val dense = spark.range(n).filter(col("id") % 2 === 0)
val kedges = base.unionByName(dense.select(col("id").as("src"), (expr("div(id, 25) * 25") + (col("id") * 7 + 3) % 25).as("dst"))).unionByName(dense.select(col("id").as("src"), (expr("div(id, 25) * 25") + (col("id") * 11 + 5) % 25).as("dst")))
time("kTruss k=3 rounds=3 on 2M vertices / ~7M edges") { val r = graft.operators.LinkGraph.kTruss(kedges, 3, 3).agg(count(lit(1)), coalesce(sum("support"), lit(0L))).collect()(0); println(s"[probe] surviving_edges=${r.getLong(0)} support_sum=${r.getLong(1)}") }
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
