// Scale probes for the spatial join and corpus snapshot diff.
//
// 1. SpatialJoin: 10M points x 10k rectangles of wildly mixed sizes —
//    the cell equi-join must stay bounded (points x |levels| rows,
//    rect covers <= budget per rect) with no nested loop.
// 2. corpusDiff: two 10M-doc snapshots differing in ~15% of rows —
//    one fingerprint projection per side + one doc_id-keyed join.
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r12c_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
import spark.implicits._
// --- 1. spatial join: 10M points, 10k rects ---
val pts = spark.range(10000000).select(col("id"), ((col("id") * 7919) % 1000000).cast("int").as("x"), ((col("id") * 104729) % 100000).cast("int").as("y")).cache()
println(s"[probe] points=${pts.count()}")
val rects = spark.range(10000).select(col("id").as("rect_id"), ((col("id") * 9973) % 900000).cast("int").as("xmin"), (((col("id") * 9973) % 900000) + 50 + (col("id") % 37) * 2000).cast("int").as("xmax"), ((col("id") * 31) % 90000).cast("int").as("ymin"), (((col("id") * 31) % 90000) + 20 + (col("id") % 11) * 700).cast("int").as("ymax"))
val sj = time("spatial joinCount 10M pts x 10k rects") { val r = graft.operators.SpatialJoin.joinCount(pts, rects).cache(); println(s"[probe] rects_out=${r.count()}, matched=${r.filter(col("n_points") > 0).count()}"); r }
sj.unpersist(); pts.unpersist()
// --- 2. corpus diff: 10M docs, ~15% mutated ---
val prev = spark.range(10000000).select(col("id").as("doc_id"), concat(lit("document body "), col("id")).as("text")).cache()
val next = prev.filter(col("doc_id") % 13 =!= 0).withColumn("text", when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2"))).otherwise(col("text"))).unionByName(prev.filter(col("doc_id") % 17 === 0).select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
println(s"[probe] prev=${prev.count()}")
time("corpusDiff 10M x 10M") { val d = graft.operators.Curation.corpusDiff(prev, next); println(d.groupBy("status").count().collect().mkString(" ")) }
prev.unpersist()
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
