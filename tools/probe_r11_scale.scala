// Scale probes for the round-11 operator families.
//
// 1. Perceptual frame near-dup: ~200k decoded frames (4,000 synthetic
//    DIB AVIs x 50 frames, 32x32) — times the decode+aHash flatMap
//    (partition-local; only 8-byte hashes shuffle) and the banded
//    Hamming pairing end to end. Frame content repeats every 40 videos
//    so the pairing has real duplicate mass (each (class, frame) slot
//    has 100 members corpus-wide).
// 2. Whole-document BFD packing: 5M-doc manifest across 1,000 shards —
//    times the one-shuffle flatMapGroups fold (the per-shard manifest
//    is (doc_id, len) pairs, ~5k docs/shard) plus the padding audit.
//
// Run: sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-memory 48g --conf spark.sql.shuffle.partitions=32 \
//   --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r11_scale.scala
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
import spark.implicits._
val nVideos = 4000
val framesPer = 50
val media = spark.range(nVideos).as[Long].map { id => graft.operators.Multimodal.MediaRecord(id, "video", graft.operators.AviCodec.write(32, 32, 25, "DIB ", (0 until framesPer).map(f => graft.operators.AviCodec.dibFrame(32, 32)((x, y) => (((id % 40) * 13 + f * 17 + x * 7 + y * 11) % 256).toInt)))) }.repartition(64).cache()
println(s"[probe] videos=${media.count()} frames=${nVideos * framesPer}")
val hashed = time(s"frameAHash decode+hash (${nVideos * framesPer} frames)") { val h = graft.operators.AviCodec.frameAHash(media).cache(); println(h.count()); h }
// the fixture is pathologically duplicate-heavy (brightness-shift
// invariance collapses most frames onto a few hashes): the PAIR
// output is inherently quadratic there, so the cluster path — star
// edges + distinct-hash edges, never within-class pairs — is the
// scale number; the pair op's candidate join is also distinct-hash
// (collapse-first) but must still EMIT the quadratic result
time("hammingClusters64 over 200k frame hashes (duplicate-heavy)") { println(graft.operators.Dedup.hammingClusters64(hashed.select((col("doc_id") * 64 + col("frame_idx")).as("id"), col("ahash").as("h"))).count()) }
hashed.unpersist(); media.unpersist()
// 3. IVFPQ refine at serving scale: 1M vectors, sqrt(n)=auto centroids,
//    32 probes, 16x32 PQ, C=4000 exact re-ranks per query — the
//    full-precision reads stay O(queries x C) however big the corpus.
val emb = graft.operators.Similarity.intEmbeddings(spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet"))
val nBase = emb.count()
val copies = (1000000 / nBase).toInt
val big = emb.crossJoin(spark.range(copies).toDF("rep")).select((col("vec_id") + col("rep") * lit(10000000L)).as("vec_id"), col("label"), expr("transform(v, (x, i) -> x + (rep * 31 + i * 7) % 1000)").as("v")).repartition(64).cache()
println(s"[probe] vectors=${big.count()}")
time("ivfPqRerankTopK (10 queries x 1M vecs, auto centroids, 32 probes, C=4000)") { println(graft.operators.Similarity.ivfPqRerankTopK(big, big.filter(col("vec_id") < 10), 10, rerankC = 4000, nCentroids = 0, nProbe = 32, m = 16, nCodes = 32, pqIters = 1).count()) }
big.unpersist()
val nDocs = 5000000
val docs = spark.range(nDocs).select(col("id").as("doc_id"), concat(lit("w "), repeat(lit("t "), (pmod(col("id") * 2654435761L, lit(250)) + 5).cast("int"))).as("text")).repartition(64).cache()
println(s"[probe] docs=${docs.count()}")
time("packBestFit 5M docs / 1000 shards (manifest fold)") { println(graft.operators.Curation.packBestFit(docs, 1000, 2048).agg(max("bin_idx"), sum("n_tokens")).head) }
time("packPadding audit (1000 shards)") { println(graft.operators.Curation.packPadding(graft.operators.Curation.packBestFit(docs, 1000, 2048), 2048).agg(avg("padding_e6")).head) }
docs.unpersist()
System.exit(0)
