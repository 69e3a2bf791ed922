// Round-15 scale probes: LPA communities at 2M vertices and WordPiece
// encode at 5M synthetic docs. Run on a QUIET host (no concurrent
// Spark), single-line statements only; --driver-memory is required —
// the shell's 1g default OOMs on the localCheckpointed edge tables:
//   /opt/spark/bin/spark-shell --master 'local[8]' --driver-memory 16g --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r15_scale.scala
// Measured (this host): lpa 2M vertices / 6.1M edges / 6 rounds 52.4 s
// (160,001 communities — each 25-block splits in two under the three
// affine maps); wordpiece encode 5M docs × 19 words 12.5 s (fused
// greedy walk, one digit word per doc -> 5M UNKs pinned).
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }

// --- LPA: 2M vertices in 80k dense 25-blocks + a bridge ring, 6 rounds
val n = 2000000L
val d = spark.range(n)
val e1 = d.select(col("id").as("src"), expr("div(id, 25) * 25 + (id * 7 + 3) % 25").as("dst"))
val e2 = d.select(col("id").as("src"), expr("div(id, 25) * 25 + (id * 11 + 5) % 25").as("dst"))
val e3 = d.select(col("id").as("src"), expr("div(id, 25) * 25 + (id * 13 + 1) % 25").as("dst"))
val eb = d.filter(col("id") % 25 === 0).select(col("id").as("src"), ((col("id") + 25) % n).as("dst"))
val edges = e1.unionByName(e2).unionByName(e3).unionByName(eb)
val nc = time("lpa 2M vertices / ~6.1M directed edges / 6 rounds")(graft.operators.LinkGraph.labelPropagation(edges, 6).count)
println(s"communities: $nc (~${n / 25} blocks)")

// --- WordPiece encode: vocab from a tiny seed corpus, 5M synthetic docs
val seed = spark.range(50L).select(col("id").as("doc_id"), lit("alpha beta gamma delta epsilon zeta theta lambda sigma omega").as("text"))
val vocab = graft.operators.TextAnalysis.wordpieceVocab(seed, 8)
println(s"vocab pieces: ${vocab.size}")
val big = spark.range(5000000L).select(col("id").as("doc_id"), concat_ws(" ", lit("alpha beta gamma delta epsilon zeta"), lit("theta lambda sigma omega alpha beta"), lit("gamma delta epsilon zeta theta lambda"), (col("id") % 100).cast("string")).as("text"))
val enc = time("wordpiece encode 5M docs x 19 words (fused greedy walk)")(graft.operators.TextAnalysis.wordpieceEncode(big, vocab).agg(sum("n_pieces"), sum("n_unk")).collect()(0))
println(s"pieces: ${enc.getLong(0)}, unk: ${enc.getLong(1)} (one digit word per doc)")
System.exit(0)
