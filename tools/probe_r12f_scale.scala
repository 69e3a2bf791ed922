// Scale probes for the distance self-join and skyline.
//
// 1. distanceJoin: 10M points in a 100k x 10k box, r = 40 — candidate
//    volume is local-density-bounded (grid 3x3 equi-join), output a
//    few-neighbor-per-point pair set.
// 2. skyline: 50M anti-correlated points (worst-ish case: a large
//    front) — the bucket prefilter must keep the final sort at
//    candidate scale, never 50M rows through one window.
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r12f_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val pts = spark.range(10000000).select(col("id"), ((col("id") * 7919) % 100000).as("x"), ((col("id") * 104729) % 10000).as("y"))
time("distanceJoin 10M points r=40") { val r = graft.operators.SpatialJoin.distanceJoin(pts, 40L); println(s"[probe] pairs=${r.count()}") }
val sky = spark.range(50000000).select(col("id"), ((col("id") * 7919) % 1000000).as("x0")).select(col("id"), col("x0").as("x"), (lit(1100000L) - col("x0") + (col("id") * 104729) % 9973).as("y"))
time("skyline 50M anti-correlated points") { val r = graft.operators.Analytics.skyline(sky, 1024L); println(s"[probe] front=${r.count()}") }
System.exit(0)
