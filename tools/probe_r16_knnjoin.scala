// Scale probe for SpatialJoin.knnWithinJoin at 10M points — the same
// density regime as the distance_join 10M probe (r=40, ~50 in-radius
// neighbors/point, tools/probe_r12f_scale.scala), but with xxhash64
// coordinates (the modular-map fixture has lattice periods: every
// point gets ~14-100 exact duplicates and all kNN distances are 0).
// The kNN join must stay OUTPUT-BOUNDED (<= k rows per point survive
// the map-side top-k) where the full pair join is pair-bounded.
// Measured (this host): 169.9 s, 40M result rows (10M x k=4) from
// ~1B directed candidates — vs distance_join's 124.9 s emitting the
// full 495M-pair set at the same density.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g --conf spark.sql.shuffle.partitions=64 --conf spark.ui.enabled=false --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r16_knnjoin.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r }
val n = 10000000L
val pts = spark.range(n).select(col("id"), (pmod(xxhash64(col("id")), lit(100000L))).as("x"), (pmod(xxhash64(col("id"), lit(1)), lit(10000L))).as("y")).localCheckpoint()
println(s"[probe] points=${pts.count()}")
val out = time("knnWithinJoin 10M points r=40 k=4")(graft.operators.SpatialJoin.knnWithinJoin(pts, 40L, 4).agg(count(lit(1)), sum("dist2")).collect()(0))
println(s"[probe] rows=${out.getLong(0)} d2_sum=${out.getLong(1)}")
System.exit(0)
