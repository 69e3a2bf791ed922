// Scale probe for product quantization at ~1M vectors: replicate the
// sf0.1 embeddings 500x (id-shifted, component-perturbed so codebook
// cells spread), then time codebook training (one Lloyd round over the
// full corpus), corpus encoding, and a 10-query ADC top-k.
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_pq_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val emb = graft.operators.Similarity.intEmbeddings(spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet"))
val n = emb.count()
val copies = (1000000 / n).toInt
val big = emb.crossJoin(spark.range(copies).toDF("rep")).select((col("vec_id") + col("rep") * lit(10000000L)).as("vec_id"), col("label"), expr("transform(v, (x, i) -> x + (rep * 31 + i * 7) % 1000)").as("v")).repartition(64).cache()
println(s"[probe] vectors=${big.count()} (base $n x $copies)")
val books = time("pqCodebooks train (16x32, 1 Lloyd round, 1M vecs)") { graft.operators.Similarity.pqCodebooks(big, 16, 32, 1) }
time("pqEncode 1M vecs") { println(graft.operators.Similarity.pqEncode(big, books).agg(sum(expr("c0 + c15"))).head.get(0)) }
time("pqTopK ADC (10 queries x 1M vecs)") { println(graft.operators.Similarity.pqTopK(big, big.filter(col("vec_id") < 10), 10, 16, 32, 1).count()) }
big.unpersist()
System.exit(0)
