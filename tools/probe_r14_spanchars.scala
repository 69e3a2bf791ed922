// span_dedup_chars stage-level timing probe (round 14). Run:
//   /opt/spark/bin/spark-shell --master 'local[8]' --conf spark.sql.shuffle.partitions=8 \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --jars target/scala-2.13/tinymdhbasespark_2.13-0.1.0.jar -I tools/probe_r14_spanchars.scala
import org.apache.spark.sql.functions._
def t[A](tag: String)(body: => A): A = { val t0 = System.nanoTime(); val r = body; println(f"[probe] $tag%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r }
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
graft.functions.GraftFunctions.register(spark)
val full1 = t("spanDedupChars cold") { graft.operators.Dedup.spanDedupChars(docs, 20, 2).write.format("noop").mode("overwrite").save() }
graft.operators.CheckpointScope.releaseAll()
val full2 = t("spanDedupChars warm") { graft.operators.Dedup.spanDedupChars(docs, 20, 2).write.format("noop").mode("overwrite").save() }
graft.operators.CheckpointScope.releaseAll()
// stage decomposition (mirrors charTxt / charReps / charMachinery)
val txt = t("charTxt ckpt") { val x = graft.operators.Dedup.probeCharTxt(docs); x.count(); x }
val reps = t("charReps ckpt") { val x = graft.operators.Dedup.probeCharReps(txt, 20); x.count(); x }
val dup = t("dup inventory") { val d = graft.operators.Dedup.probeCharDup(reps, 2); println("dup grams: " + d.count()); d }
val starts = t("dup starts") { val st = graft.operators.Dedup.probeCharStarts(reps, dup); println("start rows: " + st.count()); st }
val per = t("perText cover") { graft.operators.Dedup.probeCharPerText(reps, starts).write.format("noop").mode("overwrite").save() }
val fan = t("fan-out join") { graft.operators.Dedup.probeCharFan(txt, reps, 20, 2).write.format("noop").mode("overwrite").save() }
graft.operators.CheckpointScope.releaseAll()
System.exit(0)
