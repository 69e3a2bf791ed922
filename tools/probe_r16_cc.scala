// Round-16 incremental-CC probe (split from probe_r16_scale.scala whose
// first run dropped this section to a column-name resolve error):
// 2M-vertex prior labels from a full flood, then a 100k-edge batch fold.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r16_cc.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }

// prior graph: 80k chains of 25 vertices (id_a/id_b edge convention)
val n = 2000000L
val base = spark.range(n).filter(col("id") % 25 =!= 24).select(col("id").as("id_a"), (col("id") + 1).as("id_b")).localCheckpoint()
val prior = time("full CC flood 2M vertices / ~1.9M chain edges (yardstick)")(graft.operators.Dedup.connectedComponents(base).select(col("doc_id").as("v"), col("cluster_id").as("component")).localCheckpoint())
println(s"[probe] prior components: ${prior.select("component").distinct.count}")
// batch: 100k bridge edges, each merging two adjacent chains
val batch = spark.range(100000L).select((col("id") * 25 + 24).as("src"), (col("id") * 25 + 25).as("dst")).localCheckpoint()
val inc = time("incrementalComponents fold of 100k new edges into 2M-vertex prior")(graft.operators.LinkGraph.incrementalComponents(batch, prior).select("component").distinct.count)
println(s"[probe] merged components: $inc")
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
