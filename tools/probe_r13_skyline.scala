// Adversarial skyline probe (round 13): ALL 5M points on the front.
// x = i, y = N - i → nothing dominates anything; the bucket pre-filter
// prunes nothing and the output is the corpus. The per-bucket LOCAL
// skyline pass keeps every point too (each is locally non-dominated),
// so this measures the honest output-bound worst case: the final
// single-partition ordered emit over exactly the output rows — the
// floor any exact skyline algorithm pays when the front IS the corpus.
// The benign control shows the same operator at corpus scale with a
// small front, where the local pass caps the global window's input.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r13_skyline.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
def time[T](label: String)(body: => T): T = { val t0 = System.nanoTime(); val r = body; println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
val n = 5000000L
val adv = spark.range(n).select(col("id"), col("id").as("x"), (lit(n) - col("id")).as("y"))
val a = time("adversarial: all 5M points on the front")(graft.operators.Analytics.skyline(adv).count)
println(s"front size: $a (= corpus — output-bound by construction)")
val ben = spark.range(n).select(col("id"), ((col("id") * 48271L) % 1048576L).as("x"), ((col("id") * 16807L) % 1048576L).as("y"))
val b = time("benign: 5M pseudo-random points")(graft.operators.Analytics.skyline(ben).count)
println(s"front size: $b (global window input capped at per-bucket fronts)")
