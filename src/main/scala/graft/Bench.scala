package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PointStore
import graft.zorder.IntRange

/**
 * Benchmark main (driver contract): times every registered query at
 * `SPARK_GRAFT_SF_DIR`, plus the Z-clustered store paths (build, pruned
 * range scan, kNN) that the inventory queries exercise only in
 * derive-on-the-fly form. Prints exactly one JSON line.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up the JVM/session so the first measured query isn't charged
    // for codegen bootstrap and filesystem metadata
    spark.read.parquet(s"$sfDir/part.parquet").count()

    def timeOnce(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // min of two runs: the first pays codegen/IO warmup, the second is
    // the steady-state number a resident service would see
    def time(body: => Unit): Double = {
      val a = timeOnce(body)
      if (a < 0) return a
      val b = timeOnce(body)
      if (b < 0) a else math.min(a, b)
    }

    // the stream_* gates are end-to-end STREAMING-loop gates (each run
    // builds a whole store / replays the state machine) — measured once
    // below under their own keys so the query inventory stays
    // comparable across rounds
    val streamKeys =
      Seq("stream_ingest_range", "stream_ingest_box3", "stream_dedup", "stream_hourly",
        "stream_curate")
    val inventory = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(kv => streamKeys.contains(kv._1))
      .map { case (name, fn) =>
        name -> time { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      }
    val streamBench = streamKeys.map(k => k -> timeOnce {
      SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    })

    // z-clustered store lifecycle on the largest point source
    val storePath = s"/tmp/graft_bench_store_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val storeBench = {
      val pts = PointStore.points(
        spark.read.parquet(s"$sfDir/events.parquet"),
        col("event_id"), expr("cast(floor(value*100) as int)"), col("user_id"))
      val tBuild = time { PointStore.write(pts, storePath, 32) }
      val store = PointStore.open(spark, storePath)
      val tRange = time {
        store.rangeQuery(IntRange(10000, 30000), IntRange(40, 110))
          .write.format("noop").mode("overwrite").save()
      }
      val tKnn = time { store.knn(25000, 75, 10).write.format("noop").mode("overwrite").save() }
      Seq("store_build" -> tBuild, "store_range" -> tRange, "store_knn" -> tKnn)
    }

    // z3-clustered spatio-temporal store lifecycle on the same source
    val store3Path = s"/tmp/graft_bench_store3_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val store3Bench = {
      import graft.operators.SpatioTemporal
      val pts = SpatioTemporal.points3(
        spark.read.parquet(s"$sfDir/events.parquet"),
        col("event_id"), expr("cast(floor(value*100) as int)"), col("user_id"),
        expr("cast(event_id % 2097152 as int)"))
      val tBuild = time { SpatioTemporal.write(pts, store3Path, 32) }
      val store = SpatioTemporal.open(spark, store3Path)
      val tRange = time {
        store.rangeQuery(IntRange(10000, 30000), IntRange(40, 110), IntRange(500, 300000))
          .write.format("noop").mode("overwrite").save()
      }
      val tKnn = time { store.knn(25000, 75, 800, 10).write.format("noop").mode("overwrite").save() }
      Seq("store3_build" -> tBuild, "store3_range" -> tRange, "store3_knn" -> tKnn)
    }

    val results = inventory ++ storeBench ++ store3Bench ++ streamBench
    // Locale.ROOT: a comma-decimal default locale would break the JSON
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // the JSON also lands in a file: stdout can be polluted by build-tool
    // log prefixes, and the file is unambiguous for any driver
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    // print LAST, after Spark's shutdown chatter, and bare on stdout
    println(json)
    System.out.flush()
  }
}
