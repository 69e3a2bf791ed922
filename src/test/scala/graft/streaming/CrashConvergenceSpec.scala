package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TxDir

/** Crash-convergence: replaying ingest/compaction/recluster after any
  * interruption converges to the same store instead of duplicating or
  * losing rows. */
class CrashConvergenceSpec extends SparkSpec {

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("ingestBatch replayed with the same batchId does not duplicate") {
    val store = Files.createTempDirectory("graft-replay").toString + "/store"
    val batch = spark.read.parquet(sf("sf0.01") + "/events.parquet").limit(500)
    StreamingIngest.ingestBatch(batch, 7L, store)
    val n1 = spark.read.parquet(store).count()
    StreamingIngest.ingestBatch(batch, 7L, store) // at-least-once replay
    assert(spark.read.parquet(store).count() === n1)
    StreamingIngest.ingestBatch(batch, 8L, store) // a NEW batch does append
    assert(spark.read.parquet(store).count() === n1 * 2)
  }

  test("ingestBatch replay after a half-published crash wipes partials and redoes") {
    val store = Files.createTempDirectory("graft-partial").toString + "/store"
    val batch = spark.read.parquet(sf("sf0.01") + "/events.parquet").limit(500)
    StreamingIngest.ingestBatch(batch, 1L, store)
    val fs = fsOf(store)
    // simulate a crash mid-publish of batch 2: one orphan file of a
    // 3-file set
    val donor = fs.listStatus(new Path(store)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    fs.rename(donor, new Path(new Path(store), "ingest-2-0-of-3.parquet"))
    val before = spark.read.parquet(store).count()
    StreamingIngest.ingestBatch(batch, 2L, store)
    val after = spark.read.parquet(store).count()
    // partial set was removed (its rows were donor rows from batch 1 —
    // so the store now holds batch1-minus-donor + full batch 2)
    assert(TxDir.isComplete(fs, new Path(store), "ingest-2"))
    assert(after === before - before + 500 + (before - 500)) // = before
  }

  test("compaction replay converges when the split set already exists") {
    val store = Files.createTempDirectory("graft-compact").toString + "/store"
    val batch = spark.read.parquet(sf("sf0.01") + "/events.parquet").limit(2000)
    StreamingIngest.ingestBatch(batch, 1L, store)
    // force one big file
    StreamingIngest.recluster(spark, store, threshold = 5000L)
    val total = spark.read.parquet(store).count()
    StreamingIngest.compactOversizedFiles(spark, store, 300L)
    assert(spark.read.parquet(store).count() === total)
    // replay: compaction again is a no-op (files are all under threshold)
    StreamingIngest.compactOversizedFiles(spark, store, 300L)
    assert(spark.read.parquet(store).count() === total)
    val sizes = spark.read.parquet(store).groupBy(input_file_name()).count()
      .collect().map(_.getLong(1))
    assert(sizes.max <= 300L)
  }

  test("the 3-D octree layout runs the same put/split/recluster machinery") {
    val store = Files.createTempDirectory("graft-z3").toString + "/store"
    val batch = spark.read.parquet(sf("sf0.01") + "/events.parquet").limit(2000)
    val L3 = StreamingIngest.EventsLayout3D
    StreamingIngest.ingestBatch(batch, 1L, store, L3)
    val n1 = spark.read.parquet(store).count()
    StreamingIngest.ingestBatch(batch, 1L, store, L3) // at-least-once replay
    assert(spark.read.parquet(store).count() === n1)
    assert(spark.read.parquet(store).columns.toSet === Set("id", "x", "y", "t", "z3"))
    // major compaction into one oversized file, then a minor compaction
    // that must probe z3 footer stats (not zkey) to range-split it
    StreamingIngest.recluster(spark, store, threshold = 5000L, L3)
    StreamingIngest.compactOversizedFiles(spark, store, 300L, layout = L3)
    val sizes = spark.read.parquet(store).groupBy(input_file_name()).count()
      .collect().map(_.getLong(1))
    assert(sizes.max <= 300L, "z3 footer probe failed to split the oversized file")
    // full multiset parity with the batch derivation: nothing lost or
    // duplicated across ingest + recluster + split
    val want = L3.derive(batch).select("id", "z3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val got = spark.read.parquet(store).select("id", "z3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(got.toSeq === want.toSeq)
  }

  test("isComplete rejects a mixed-generation set (stale file + partial redo)") {
    val dir = Files.createTempDirectory("graft-mixed").toString
    val fs = fsOf(dir)
    val d = new Path(dir)
    // stale survivor of an old 2-file generation + partial 3-file redo
    fs.create(new Path(d, "ingest-9-2-of-2.parquet")).close()
    fs.create(new Path(d, "ingest-9-0-of-3.parquet")).close()
    fs.create(new Path(d, "ingest-9-1-of-3.parquet")).close()
    assert(!TxDir.isComplete(fs, d, "ingest-9"))
    TxDir.cleanPartial(fs, d, "ingest-9")
    assert(fs.listStatus(d).isEmpty)
  }

  test("a single-zkey oversized file is not churned by compaction") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-hotkey").toString + "/store"
    // 1000 points at ONE coordinate: unsplittable by z-range
    val pts = graft.operators.PointStore.points(
      (1 to 1000).map(i => (i.toLong, 7, 9)).toDF("pid", "px", "py"),
      col("pid"), col("px"), col("py"))
    graft.operators.PointStore.write(pts, store, 1)
    val before = fsOf(store).listStatus(new Path(store))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    StreamingIngest.compactOversizedFiles(spark, store, 100L)
    val after = fsOf(store).listStatus(new Path(store))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    assert(after === before, "unsplittable file was rewritten")
    assert(spark.read.parquet(store).count() === 1000L)
  }

  test("crashed split (published set + surviving source) converges, not duplicates") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-dupsplit").toString + "/store"
    val pts = graft.operators.PointStore.points(
      (1 to 1000).map(i => (i.toLong, i * 37 % 5000, i * 91 % 5000)).toDF("pid", "px", "py"),
      col("pid"), col("px"), col("py"))
    graft.operators.PointStore.write(pts, store, 1)
    val fs = fsOf(store)
    val src = fs.listStatus(new Path(store)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    // stash the source, split normally, then put the source back —
    // exactly the state a crash between TxDir.publish and the source
    // delete leaves behind
    val stash = new Path(Files.createTempDirectory("graft-stash").toString, src.getName)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, stash, false, spark.sparkContext.hadoopConfiguration)
    StreamingIngest.compactOversizedFiles(spark, store, 200L)
    org.apache.hadoop.fs.FileUtil.copy(fs, stash, fs, src, false, spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(store).count() === 2000L, "precondition: duplicates visible")
    // ... recluster must NOT bake the duplicates into the rebuild
    StreamingIngest.recluster(spark, store, 10000L)
    assert(spark.read.parquet(store).count() === 1000L)
    // and the start-time sweep converges the same crash state too
    // (fresh store: the reclustered one above has new file names)
    val store2 = Files.createTempDirectory("graft-dupsplit2").toString + "/store"
    graft.operators.PointStore.write(pts, store2, 1)
    val src2 = fs.listStatus(new Path(store2)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    val stash2 = new Path(stash.getParent, "stash2-" + src2.getName)
    org.apache.hadoop.fs.FileUtil.copy(fs, src2, fs, stash2, false, spark.sparkContext.hadoopConfiguration)
    StreamingIngest.compactOversizedFiles(spark, store2, 200L)
    org.apache.hadoop.fs.FileUtil.copy(fs, stash2, fs, src2, false, spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(store2).count() === 2000L, "precondition: duplicates visible")
    StreamingIngest.convergeSplits(spark, store2, 200L)
    assert(spark.read.parquet(store2).count() === 1000L)
    assert(!fs.exists(src2), "duplicate source not dropped")
  }

  test("recluster re-clusters survivors of a split-broken committed ingest set") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-broken").toString
    val store = dir + "/store"
    val fs = fsOf(store)
    def mkPts(ids: Range) = graft.operators.PointStore.points(
      ids.map(i => (i.toLong, i * 37 % 5000, i * 91 % 5000)).toDF("pid", "px", "py"),
      col("pid"), col("px"), col("py"))
    // committed generation 1: a complete 3-file set
    graft.operators.PointStore.write(mkPts(1 to 900), s"$dir/s1", 3)
    TxDir.publish(fs, new Path(s"$dir/s1"), new Path(store), "ingest-1")
    // newer generation 2 marks gen 1 as committed
    graft.operators.PointStore.write(mkPts(1000 to 1099), s"$dir/s2", 1)
    TxDir.publish(fs, new Path(s"$dir/s2"), new Path(store), "ingest-2")
    // minor compaction consumed one member of gen 1: its rows republish
    // under a complete split set, the member is deleted -> set broken
    val member = new Path(new Path(store), "ingest-1-0-of-3.parquet")
    graft.operators.PointStore.write(spark.read.parquet(member.toString), s"$dir/s3", 2)
    TxDir.publish(fs, new Path(s"$dir/s3"), new Path(store), "split-aaaabbbbcccc")
    fs.delete(member, false)
    val total = spark.read.parquet(store).count()
    StreamingIngest.recluster(spark, store, 10000L)
    // nothing lost, and the broken set's survivors were ABSORBED into
    // the rebuild (not preserved verbatim forever)
    assert(spark.read.parquet(store).count() === total)
    val left = fs.listStatus(new Path(store)).map(_.getPath.getName)
      .filter(_.startsWith("ingest-1-"))
    assert(left.isEmpty, s"split-broken survivors preserved verbatim: ${left.mkString(",")}")
  }

  test("minor compaction rewrites all oversized files in one pass, not one job each") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-onejob").toString + "/store"
    val pts = graft.operators.PointStore.points(
      (1 to 6000).map(i => (i.toLong, i * 37 % 5000, i * 91 % 5000)).toDF("pid", "px", "py"),
      col("pid"), col("px"), col("py"))
    graft.operators.PointStore.write(pts, store, 6) // 6 files x ~1000 rows
    val sc = spark.sparkContext
    sc.setJobGroup("one-pass-compact", "compaction job count probe")
    try StreamingIngest.compactOversizedFiles(spark, store, 300L)
    finally sc.clearJobGroup()
    Thread.sleep(1500) // status store updates asynchronously
    val jobs = sc.statusTracker.getJobIdsForGroup("one-pass-compact").length
    assert(jobs > 0 && jobs <= 4, s"expected a bounded job count, got $jobs")
    // behavior unchanged: everything under threshold, nothing lost
    assert(spark.read.parquet(store).count() === 6000L)
    val sizes = spark.read.parquet(store).groupBy(input_file_name()).count()
      .collect().map(_.getLong(1))
    assert(sizes.max <= 300L, s"oversized survivor: ${sizes.max}")
  }

  test("recluster swap preserves files published after its snapshot") {
    val store = Files.createTempDirectory("graft-concur").toString + "/store"
    val events = spark.read.parquet(sf("sf0.01") + "/events.parquet")
    StreamingIngest.ingestBatch(events.limit(800), 1L, store)
    val fs = fsOf(store)
    val snapshot = fs.listStatus(new Path(store)).map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
    // build a finished-but-unswapped recluster scratch (crash just
    // before the swap): rebuilt data + snapshot manifest + READY marker
    val scratch = new Path(store + ".compacting")
    graft.operators.PointStore.write(
      spark.read.parquet(store), scratch.toString, 4)
    val out = fs.create(new Path(scratch, "_GRAFT_RECLUSTER_SNAPSHOT"))
    out.write(snapshot.mkString("\n").getBytes("UTF-8")); out.close()
    // a concurrent batch publishes AFTER the snapshot, BEFORE the swap
    StreamingIngest.ingestBatch(
      events.filter(col("event_id") % 3 === 1).limit(600), 2L, store)
    fs.create(new Path(scratch, "_GRAFT_RECLUSTER_READY")).close()
    StreamingIngest.recoverRecluster(spark, store)
    // nothing lost: reclustered batch 1 + preserved batch 2
    assert(spark.read.parquet(store).count() === 1400L)
    assert(TxDir.isComplete(fs, new Path(store), "ingest-2"))
  }

  test("interrupted recluster converges from every crash state") {
    val store = Files.createTempDirectory("graft-recl").toString + "/store"
    val batch = spark.read.parquet(sf("sf0.01") + "/events.parquet").limit(1000)
    StreamingIngest.ingestBatch(batch, 1L, store)
    val total = spark.read.parquet(store).count()
    val fs = fsOf(store)

    // state A: scratch without marker (build died) -> discard scratch
    val scratch = new Path(store + ".compacting")
    fs.mkdirs(scratch)
    fs.create(new Path(scratch, "part-00000-dead.parquet")).close()
    StreamingIngest.recoverRecluster(spark, store)
    assert(!fs.exists(scratch))
    assert(spark.read.parquet(store).count() === total)

    // state B: scratch with marker, store deleted (swap died) -> finish
    StreamingIngest.recluster(spark, store, 400L) // produces a clean store
    val files = fs.listStatus(new Path(store)).map(_.getPath.getName).toSet
    fs.rename(new Path(store), scratch)
    fs.create(new Path(scratch, "_GRAFT_RECLUSTER_READY")).close()
    StreamingIngest.recoverRecluster(spark, store)
    assert(fs.exists(new Path(store)) && !fs.exists(scratch))
    assert(spark.read.parquet(store).count() === total)
    assert(fs.listStatus(new Path(store)).map(_.getPath.getName).toSet === files)
  }
}
