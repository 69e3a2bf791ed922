// Stage-level timing for the span-dedup pipeline on the 5%-dup 1M corpus:
// where do exact and approx actually spend their time?
import org.apache.spark.sql.functions._
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime; val r = f; println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r }
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))
val copies = 200
val fivepct = docs.crossJoin(spark.range(copies).toDF("rep")).select((col("doc_id") + col("rep") * lit(10000000L)).as("doc_id"), when(col("doc_id") % 20 === 0, col("text")).otherwise(array_join(transform(split(col("text"), " "), t => concat(t, lit("~d"), col("doc_id") + col("rep") * lit(10000000L))), " ")).as("text")).repartition(64).cache()
println(s"[probe] rows=${fivepct.count()}")
graft.functions.GraftFunctions.register(spark)
val th = "cast(conv(substr(md5(concat('sp:', t)), 1, 15), 16, 10) as bigint)"
val txt = time("txt checkpoint") { fivepct.select(col("doc_id"), md5(col("text")).as("tkey"), col("text")).localCheckpoint() }
val reps0 = txt.groupBy("tkey").agg(min(col("doc_id")).as("min_doc"), count(lit(1)).as("m"), first(col("text")).as("text")).withColumn("ws", graft.operators.TextAnalysis.tokens(col("text"))).filter(size(col("ws")) >= 1).withColumn("hs", expr(s"transform(ws, t -> $th)")).withColumn("ghs", org.apache.spark.sql.graftbridge.Bridge.column(graft.functions.PolyGrams(org.apache.spark.sql.graftbridge.Bridge.expression(col("hs")), 5))).select(col("tkey"), col("min_doc"), col("m"), col("ws"), col("ghs"))
val reps = time("reps checkpoint (tokenize+md5+poly)") { reps0.localCheckpoint() }
val dup = reps.select(col("min_doc"), col("m"), explode(expr("array_distinct(ghs)")).as("gh")).groupBy("gh").agg(sum(col("m")).as("df"), min(col("min_doc")).as("keeper_doc")).filter(col("df") >= 2)
time("exact: dup inventory agg") { println(dup.count()) }
val fpSlice = "array_distinct(transform(sequence(1, size(ghs)-3), j -> array_min(slice(ghs, j, 4))))"
val fpLeast = "array_distinct(transform(sequence(0, size(ghs)-4), j -> least(ghs[j], ghs[j+1], ghs[j+2], ghs[j+3])))"
val fpsSlice = reps.select(col("tkey"), col("m"), explode(when(size(col("ghs")) >= 4, expr(fpSlice)).otherwise(expr("cast(array() as array<bigint>)"))).as("fp"))
val fpsLeast = reps.select(col("tkey"), col("m"), explode(when(size(col("ghs")) >= 4, expr(fpLeast)).otherwise(expr("cast(array() as array<bigint>)"))).as("fp"))
time("approx: fp rows (slice+array_min)") { println(fpsSlice.count()) }
time("approx: fp rows (least, no alloc)") { println(fpsLeast.count()) }
val dupFp = fpsLeast.groupBy("fp").agg(sum(col("m")).as("fdf")).filter(col("fdf") >= 2).select("fp")
time("approx: dup fp agg") { println(dupFp.count()) }
val candKeys = fpsLeast.join(dupFp, "fp").select("tkey").union(reps.filter(col("m") > 1).select("tkey")).distinct()
val ck = time("approx: candKeys join+distinct+checkpoint") { candKeys.localCheckpoint() }
println(s"[probe] candidate texts=${ck.count()} of ${reps.count()}")
val active = time("approx: active semi-join checkpoint") { reps.join(ck, Seq("tkey"), "left_semi").localCheckpoint() }
println(s"[probe] active rows=${active.count()}")
System.exit(0)
