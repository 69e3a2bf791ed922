// Scale probes (round 13): q-digest and KMV at pipeline scale.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r13_sketch_scale.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
// 200M skewed integer values in the 2^16 universe (Zipf-ish via modular squares)
val vals = spark.range(200000000L).select(col("id"), ((col("id") * col("id") + 17L) % 65536L).as("cents"))
val probe = time("q-digest: 200M values, build + 7-phi probe")(graft.operators.QuantileSketch.quantileProbe(vals, "cents").collect)
println(probe.map(r => s"phi=${r.getInt(0)} est=${r.getLong(3)} err=${r.getLong(4)} bound=${r.getLong(5)} ok=${r.getBoolean(6)}").mkString("\n"))
// KMV over 20M synthetic docs (~21M distinct tokens)
val docs = spark.range(20000000L).select(col("id").as("doc_id"), concat(lit("common shared base terms u"), col("id"), lit(" v"), (col("id") % 1000000L)).as("text"))
val kd = time("KMV: 20M docs / ~21M distinct tokens, distinct estimate")(graft.operators.Sketches.kmvDistinct(docs).collect)(0)
println(s"exact=${kd.getLong(0)} est=${kd.getLong(1)} err_bp=${kd.getLong(2)}")
val a = docs.filter(col("doc_id") % 3 < 2)
val b = docs.filter(col("doc_id") % 3 > 0)
val kj = time("KMV: Jaccard of two 2/3-overlapping shards")(graft.operators.Sketches.kmvJaccard(a, b).collect)(0)
println(s"j_exact_e4=${kj.getLong(0)} j_est_e4=${kj.getLong(1)}")
