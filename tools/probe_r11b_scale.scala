// Scale probes for the round-11 late additions.
//
// 1. DCT pHash: 200k synthetic 32x32 PNGs — times decode + fixed-point
//    DCT (partition-local; ~10k integer multiplies per image) and the
//    collapse-first banded pairing over the resulting hashes.
// 2. HTML extraction: 1M constructed pages — times the single-project
//    regexp/replace chain (no shuffle; the operator's whole cost).
// 3. Distributed perceptron: 1M synthetic docs, 64 shards, 10 epochs —
//    times the one-scan feature build and the epoch loop (per epoch:
//    one mapGroups fold + a model-scale collect).
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r11b_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
import spark.implicits._
// --- 1. pHash at 200k images (500 perceptual classes x 400 variants) ---
val imgs = spark.range(200000).as[Long].map(id => graft.operators.Multimodal.MediaRecord(id, "image", graft.operators.Multimodal.perturbedImageP(id % 2000))).repartition(64).cache()
println(s"[probe] images=${imgs.count()}")
val ph = time("imagePHash decode+DCT (200k)") { val h = graft.operators.Multimodal.imagePHash(imgs).cache(); println(h.count()); h }
time("hammingClusters64 over 200k phashes (duplicate-heavy)") { println(graft.operators.Dedup.hammingClusters64(ph.select(col("doc_id").as("id"), col("phash").as("h"))).count()) }
imgs.unpersist(); ph.unpersist()
// --- 2. HTML extraction at 1M pages ---
val base = spark.range(1000000).select(col("id").as("doc_id"), lit("src").as("source"), expr("concat('tok', cast(id % 97 as string), ' data value ', repeat('word group table spark ', cast(8 + id % 40 as int)))").as("text"))
val pages = base.withColumn("html", expr(graft.HtmlQueries.FixtureHtmlSql)).select("doc_id", "html").cache()
println(s"[probe] pages=${pages.count()}")
time("Html.extract (1M pages)") { println(graft.operators.Html.extract(pages).agg(sum(length(col("text"))), sum(col("n_links"))).head()) }
time("Html.links (1M pages)") { println(graft.operators.Html.links(pages).count()) }
pages.unpersist()
// --- 3. perceptron at 1M docs, 64 shards ---
val docs1m = spark.range(1000000).select(col("id").as("doc_id"), expr("concat(case when id % 10 < 4 then 'spark stream ' else '' end, 'key value table row scan filter group agg join sort tok', cast(id % 211 as string), ' batch window column', repeat(' part merge hash', cast(id % 13 as int)))").as("text")).cache()
println(s"[probe] docs=${docs1m.count()}")
val w1m = time("ipmTrain 1M docs, 64 shards, 10 epochs") { graft.operators.Perceptron.ipmTrain(docs1m, shards = 64) }
time("score 1M docs") { println(graft.operators.Perceptron.score(docs1m, w1m).agg(sum(col("correct"))).head()) }
docs1m.unpersist()
// --- 4. PageRank at 2M vertices / 6M edges ---
val nv = 2000000L
val vb = spark.range(nv).select(col("id").as("doc_id")).crossJoin(spark.range(1).select(lit(nv).as("nn")))
val ed = vb.select(col("doc_id").as("src"), ((col("doc_id")*col("doc_id")+7) % col("nn")).as("dst")).unionByName(vb.select(col("doc_id").as("src"), ((col("doc_id")*31+7) % col("nn")).as("dst"))).unionByName(vb.select(col("doc_id").as("src"), (col("doc_id") % 1000).as("dst")))
time("pageRank 2M vertices / 6M edges / 5 iters") { println(graft.operators.LinkGraph.pageRank(ed, 5).count()) }
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
