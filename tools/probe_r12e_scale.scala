// Scale probes for the round-12 analytics battery.
//
// 1. kCore: 2M-vertex / ~6M-edge graph with a dense planted kernel —
//    peel rounds must stay few, each round bounded by the shrinking
//    edge list (semi-joins + partial-agg degrees, checkpoint/release).
// 2. phraseOccurrences: 1M docs x 50 three-token queries — postings
//    exploded once, query side broadcast, candidate rollup bounded.
// 3. linkEd1: 1M dirty names vs 100k catalog — deletion-neighborhood
//    equi-join, never a cross product.
// 4. cohortRetention: 50M events / 1M users / 365 daily buckets —
//    one user shuffle, span-bounded collect_set.
// 5. scd2History: 20M-row change log over 1M keys — one key shuffle.
// 6. pmiPairs: 1M docs, top-40 vocabulary — bounded self-join.
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r12e_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
import spark.implicits._
// --- 1. k-core: 2M vertices, planted dense blocks on the even half ---
val n = 2000000L
val base = spark.range(n).select(col("id").as("src"), ((col("id") * col("id") + 7) % n).as("dst")).unionByName(spark.range(n).select(col("id").as("src"), ((col("id") * 31 + 7) % n).as("dst"))).unionByName(spark.range(n).select(col("id").as("src"), (col("id") % 25).as("dst")))
val dense = spark.range(n).filter(col("id") % 2 === 0)
val kedges = base.unionByName(dense.select(col("id").as("src"), (expr("div(id, 25) * 25") + (col("id") * 7 + 3) % 25).as("dst"))).unionByName(dense.select(col("id").as("src"), (expr("div(id, 25) * 25") + (col("id") * 11 + 5) % 25).as("dst")))
time("kCore k=5 on 2M vertices / ~7M edges") { val r = graft.operators.LinkGraph.kCore(kedges, 5); println(s"[probe] core_vertices=${r.count()}") }
graft.operators.CheckpointScope.releaseAll()
// --- 2. phrase search: 1M docs, 50 queries ---
val words = (0 until 64).map(i => s"w$i")
val docsDf = spark.range(1000000).select(col("id").as("doc_id"), concat_ws(" ", (0 until 12).map(j => element_at(array(words.map(lit): _*), ((col("id") * (j * 2 + 3) + j) % 64 + 1).cast("int"))): _*).as("text")).cache()
println(s"[probe] docs=${docsDf.count()}")
val queries = docsDf.filter(col("doc_id") % 20000 === 1).select(col("doc_id").as("query_id"), concat_ws(" ", slice(split(col("text"), " "), 2, 3)).as("phrase"))
time("phraseOccurrences 1M docs x 50 queries") { val r = graft.operators.Search.phraseOccurrences(queries, docsDf); println(s"[probe] matches=${r.count()}") }
// --- 6. PMI pairs over the same 1M docs ---
time("pmiPairs 1M docs topN=40") { val r = graft.operators.Cooccur.pmiPairs(docsDf, 40, 5L); println(s"[probe] pairs=${r.count()}") }
docsDf.unpersist()
// --- 3. record linkage: 1M dirty vs 100k catalog ---
val cat = spark.range(100000).select(col("id").as("id_r"), concat(lit("entity name "), col("id"), lit(" suffix"), (col("id") % 97)).as("name_r")).cache()
println(s"[probe] catalog=${cat.count()}")
val dirty = spark.range(1000000).select(col("id").as("id_l"), (col("id") % 100000).as("src")).select(col("id_l"), concat(lit("entity name "), col("src"), lit(" suffix"), (col("src") % 97)).as("nm")).select(col("id_l"), expr("concat(substring(nm, 1, 5), substring(nm, 7, length(nm)))").as("name_l"))
time("linkEd1 1M dirty x 100k catalog") { val r = graft.operators.RecordLinkage.linkEd1(dirty, cat); println(s"[probe] links=${r.count()}") }
cat.unpersist()
// --- 4. cohort retention: 50M events, 1M users, 365 days ---
val D = graft.operators.Analytics.DayNanos
val ev = spark.range(50000000).select(col("id").as("event_id"), (col("id") % 1000000).as("user_id"), (((col("id") * 2654435761L) % 365) * D + (col("id") % 86400) * 1000000000L).as("ts"))
time("cohortRetention 50M events / 1M users / 365 days") { val r = graft.operators.Analytics.cohortRetention(ev, D); println(s"[probe] cells=${r.count()}") }
// --- 5. SCD2: 20M-row change log over 1M keys ---
val log = spark.range(20000000).select((col("id") % 1000000).as("k"), (col("id") / 1000000).as("o"), col("id").as("tb"), ((col("id") * 7) % 3).cast("string").as("a"))
time("scd2History 20M rows / 1M keys") { val r = graft.operators.Analytics.scd2History(log, col("k"), col("o"), col("tb"), col("a")); println(s"[probe] segments=${r.count()}") }
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
