// Round-18 scale probes for the r17/r18 store surfaces:
//  A) a 10M-point store serving range/kNN through a 100k-marker
//     equality-tombstone backlog PLUS a 70-rectangle range-tombstone
//     backlog (over MaxCompiledRangeMarkers=64, so reads take the
//     broadcast anti-join fallback), then the same queries after
//     compactDeletes folds the backlog — fold must be result-invisible
//     and the folded reads regain ladder pushdown;
//  B) a 1M-doc postings store takedown: the doclens-sidecar probe
//     (doc-id-clustered, footer-stats file skipping) vs the forced
//     one-scan fallback (sidecar renamed away) on the same store.
// Results go into README.md's measured-scale notes. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar \
//     -I tools/probe_r18_tombstones.scala 2>/dev/null
import org.apache.spark.sql.functions._
import graft.operators.PointStore
import graft.zorder.IntRange
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"PROBE $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val root = "/tmp/probe_r18"
new java.io.File(root).mkdirs()
// ---- A: point-store tombstone backlog at 10M points ----
val n = 10000000L
val base = spark.range(n).select(col("id"), ((col("id") * 2654435761L) % 100000).cast("int").as("px"), ((col("id") * 40503L) % 100000).cast("int").as("py"), lit(0L).as("put_seq"))
val pts = PointStore.points(base, col("id"), col("px"), col("py"), Seq(col("put_seq")))
time("A write 10M-point z-clustered store") { PointStore.write(pts, s"$root/store", 64) }
val store = PointStore.open(spark, s"$root/store")
time("A append 100k equality markers (ids %100=0, seq 1)") { store.delete(base.filter(col("id") % 100 === 0).select(col("id"), col("px").as("x"), col("py").as("y"), lit(1L).as("put_seq"))) }
val rects = ((0 until 69).map(i => (90000 + i, 90000 + i, 90000, 90010, 1L)) :+ (10000, 20000, 10000, 20000, 1L))
time("A append 70 range markers (> compiled cap)") { store.deleteRange(spark.createDataFrame(rects).toDF("xmin", "xmax", "ymin", "ymax", "put_seq")) }
val RXp = IntRange(15000, 45000)
val RYp = IntRange(15000, 45000)
def serve(tag: String) = { val live = store.live(Seq("put_seq")); val r = time(s"A rangeQuery through $tag") { PointStore.rangeQuery(live, RXp, RYp).agg(count(lit(1)), coalesce(sum("id"), lit(0L))).head }; val k = time(s"A kNN(50000,50000,10) through $tag") { PointStore.knn(live, 50000, 50000, 10).agg(coalesce(sum("id"), lit(0L)), coalesce(sum("dist2"), lit(0L))).head }; (r.getLong(0), r.getLong(1), k.getLong(0), k.getLong(1)) }
val pending = serve("100k eq + 70 rect pending markers (anti-join fallback)")
println(s"PROBE A pending results: $pending")
time("A compactDeletes folds the whole backlog") { store.compactDeletes(Seq("put_seq"), numPartitions = 64) }
val folded = serve("folded store (zero pending markers)")
println(s"PROBE A folded results: $folded")
println(s"PROBE A fold result-invisible: ${pending == folded}")
// ---- B: 1M-doc postings takedown, sidecar probe vs forced scan ----
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
val big = docs.crossJoin(spark.range(200).toDF("rep")).select((col("doc_id") + col("rep") * lit(1000000L)).as("doc_id"), col("text")).repartition(64).cache()
println(s"PROBE B corpus rows: ${big.count()}")
time("B build 1M-doc postings store (term-clustered + doclens sidecar)") { graft.operators.PostingsStore.build(big, s"$root/postings") }
val fsB = new org.apache.hadoop.fs.Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
println(s"PROBE B doclens files: ${fsB.listStatus(new org.apache.hadoop.fs.Path(s"$root/postings/doclens/base")).count(_.getPath.getName.endsWith(".parquet"))}, postings files: ${fsB.listStatus(new org.apache.hadoop.fs.Path(s"$root/postings/postings/base")).count(_.getPath.getName.endsWith(".parquet"))}")
import spark.implicits._
val ids1 = (0 until 100).map(i => i * 9973L + 37L).toDF("doc_id")
time("B takedown 100 docs via doclens sidecar probe") { graft.operators.PostingsStore.deleteDocs(spark, s"$root/postings", ids1, 1L) }
// force the one-scan fallback: hide the sidecar (partial coverage -> scan)
fsB.rename(new org.apache.hadoop.fs.Path(s"$root/postings/doclens"), new org.apache.hadoop.fs.Path(s"$root/postings/doclens_off"))
val ids2 = (0 until 100).map(i => i * 9973L + 41L).toDF("doc_id")
time("B takedown 100 docs via forced postings scan (no sidecar)") { graft.operators.PostingsStore.deleteDocs(spark, s"$root/postings", ids2, 2L) }
fsB.rename(new org.apache.hadoop.fs.Path(s"$root/postings/doclens_off"), new org.apache.hadoop.fs.Path(s"$root/postings/doclens"))
val st = graft.operators.PostingsStore.stats(spark, s"$root/postings").head
println(s"PROBE B stats after takedowns: n_docs=${st.getLong(0)} avgdl=${st.getLong(1)}")
org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration).delete(new org.apache.hadoop.fs.Path(root), true)
System.exit(0)
