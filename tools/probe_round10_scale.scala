// Round-10 scale probe: the STREAMED store's read path. Grow a 2-D
// point store through 50 microbatches (~2M rows total: sf0.1 events
// replicated 20x with shifted ids) with per-batch minor compaction,
// then major-compact (recluster), and compare range/knn latency at
// each stage against a batch-written store of the identical data.
// Results go into README.md's measured-scale notes. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar \
//     -I tools/probe_round10_scale.scala 2>/dev/null
// (nanosAsLong: the driver's events.parquet carries TIMESTAMP(NANOS),
// which Spark 4 otherwise rejects at footer read)
import org.apache.spark.sql.functions._
import graft.operators.PointStore
import graft.streaming.StreamingIngest
import graft.zorder.IntRange
val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet").select("event_id", "user_id", "value")
val copies = 20
val big = ev.crossJoin(spark.range(copies).toDF("rep")).select((col("event_id") + col("rep") * lit(10000000L)).as("event_id"), col("user_id"), col("value")).repartition(64).cache()
println(s"PROBE event rows: ${big.count()}")
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"PROBE $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val base = java.nio.file.Files.createTempDirectory("graft-probe10").toString
val streamedPath = s"$base/streamed"
val batchPath = s"$base/batch"
val threshold = 100000L
time("ingest 50 batches (~40k rows each) + minor compaction") {
  var pending: Seq[String] = Nil
  for (b <- 0 until 50) {
    val slice = big.filter(pmod(col("event_id"), lit(50)) === b)
    val published = StreamingIngest.ingestBatch(slice, b, streamedPath)
    StreamingIngest.compactOversizedFiles(spark, streamedPath, threshold, Some(pending))
    pending = published
  }
  StreamingIngest.compactOversizedFiles(spark, streamedPath, threshold, Some(pending))
}
val nFilesGrown = new java.io.File(streamedPath).listFiles.count(_.getName.endsWith(".parquet"))
println(s"PROBE streamed store files after 50 batches + minor compaction: $nFilesGrown")
time("batch write (same 2M rows, 64 partitions)") { PointStore.write(PointStore.points(big, col("event_id"), expr("cast(floor(value*100) as int)"), col("user_id")), batchPath, 64) }
def bench(label: String, path: String): Unit = {
  val store = PointStore.open(spark, path)
  for (i <- 1 to 2) {
    time(s"$label range_query warm$i") { store.rangeQuery(IntRange(10000, 30000), IntRange(40, 110)).write.format("noop").mode("overwrite").save() }
  }
  for (i <- 1 to 2) {
    time(s"$label knn warm$i") { store.knn(25000, 75, 10).write.format("noop").mode("overwrite").save() }
  }
}
bench("STREAMED-GROWN (pre-recluster)", streamedPath)
bench("BATCH-WRITTEN", batchPath)
time("major compaction (recluster)") { StreamingIngest.recluster(spark, streamedPath, threshold) }
val nFilesRe = new java.io.File(streamedPath).listFiles.count(_.getName.endsWith(".parquet"))
println(s"PROBE streamed store files after recluster: $nFilesRe")
bench("STREAMED-GROWN (post-recluster)", streamedPath)
// correctness cross-check: identical range aggregates on both stores
val a = PointStore.open(spark, streamedPath).rangeQuery(IntRange(10000, 30000), IntRange(40, 110)).agg(count(lit(1)), sum("id")).head
val b = PointStore.open(spark, batchPath).rangeQuery(IntRange(10000, 30000), IntRange(40, 110)).agg(count(lit(1)), sum("id")).head
println(s"PROBE parity: streamed=$a batch=$b match=${a == b}")
System.exit(0)
