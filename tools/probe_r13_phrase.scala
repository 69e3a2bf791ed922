// Adversarial phrase-search probe (round 13): ALL-stopword phrases.
// The fixture vocabulary is ~31 near-universal terms, so EVERY term is
// corpus-frequent — the worst case for rarest-term anchoring, where the
// candidate set is still df(rarest) ≈ n_postings / |vocab| per query.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r13_phrase.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val toks = d.select(posexplode(graft.operators.TextAnalysis.tokens(col("text"))).as(Seq("p", "w")))
val top = toks.groupBy("w").count.orderBy(col("count").desc).limit(4).collect.map(_.getString(0))
println(s"top-df terms (the stopword phrase): ${top.mkString(" ")}")
val qs = spark.range(1).select(lit(0L).as("query_id"), lit(top.mkString(" ")).as("phrase"))
def time[T](label: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
val warm = time("warmup (plan+codegen)")(graft.operators.Search.phraseOccurrences(qs, d).count)
val n = time("all-stopword phrase, steady state")(graft.operators.Search.phraseOccurrences(qs, d).count)
println(s"matches: $n (phrase of the 4 highest-df terms over ${d.count} docs)")
// the same 27-query mixed workload the gate runs, for comparison
val gq = d.filter(col("doc_id") % 37 === 1).filter(size(graft.operators.TextAnalysis.tokens(col("text"))) >= 4).select(col("doc_id").as("query_id"), concat_ws(" ", slice(graft.operators.TextAnalysis.tokens(col("text")), 2, 3)).as("phrase"))
val g = time("gate workload, steady state")(graft.operators.Search.phraseOccurrences(gq, d).count)
println(s"gate rows: $g")
