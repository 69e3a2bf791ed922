package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.PointStore
import graft.zorder.IntRange

class ZOrderPruningSpec extends SparkSpec {

  private lazy val storeDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-prune").toString + "/store"
    val rnd = new scala.util.Random(42)
    val pts = (0 until 20000).map(i => (i.toLong, rnd.nextInt(4096), rnd.nextInt(4096)))
    PointStore.write(PointStore.points(pts.toDF("pid", "px", "py"),
      col("pid"), col("px"), col("py")), dir, 8)
    dir
  }

  test("rule injects tight zkey intervals for raw x/y range filters") {
    spark.experimental.extraOptimizations = Seq(ZOrderPruningRule)
    try {
      val df = spark.read.parquet(storeDir)
        .filter(col("x").between(100, 200) && col("y").between(3000, 3100))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("zkey"), optimized)
      // results identical to the un-pruned plan
      spark.experimental.extraOptimizations = Nil
      val expect = spark.read.parquet(storeDir)
        .filter(col("x").between(100, 200) && col("y").between(3000, 3100))
        .select("id").collect().map(_.getLong(0)).toSet
      spark.experimental.extraOptimizations = Seq(ZOrderPruningRule)
      val got = df.select("id").collect().map(_.getLong(0)).toSet
      assert(got === expect)
      assert(got.nonEmpty)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule is idempotent and skips filters already referencing zkey") {
    spark.experimental.extraOptimizations = Seq(ZOrderPruningRule)
    try {
      val df = spark.read.parquet(storeDir)
        .filter(PointStore.rangeFilter(IntRange(0, 50), IntRange(0, 50)))
      // optimizer runs rules to fixpoint — if the rule re-fired on its own
      // output this would not converge / would nest zkey predicates deeper
      val n = df.count()
      val brute = spark.read.parquet(storeDir)
        .filter(col("x") <= 50 && col("y") <= 50).count()
      assert(n === brute)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule leaves non-point filters and partial bounds untouched") {
    spark.experimental.extraOptimizations = Seq(ZOrderPruningRule)
    try {
      // only x bounded -> no rewrite
      val df = spark.read.parquet(storeDir).filter(col("x") < 10)
      assert(!df.queryExecution.optimizedPlan.toString.contains("zkey <="))
      // unrelated relation untouched
      val li = spark.read.parquet(sf() + "/part.parquet").filter(col("p_size") < 10)
      assert(li.count() > 0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("negative coordinates: a rectangle spanning zero bails instead of pruning wrong") {
    import spark.implicits._
    // nothing stops a marked relation from holding negative coordinates —
    // their zkeys interleave sign bits; a clamped conjunct would drop them
    val df = PointStore.points(
      Seq((1L, -10, 5), (2L, -1, 0), (3L, 3, 4), (4L, 7, 7), (5L, -10000, 3))
        .toDF("pid", "px", "py"),
      col("pid"), col("px"), col("py"))
    def query = df.filter(col("x") >= -10 && col("x") <= 5 && col("y").between(0, 5))
    spark.experimental.extraOptimizations = Nil
    val expect = query.select("id").collect().map(_.getLong(0)).toSet
    spark.experimental.extraOptimizations = Seq(ZOrderPruningRule)
    try {
      val got = query.select("id").collect().map(_.getLong(0)).toSet
      assert(got === expect)
      assert(got === Set(1L, 2L, 3L))
      // the rule must not inject any zkey conjunct (bail, not clamp) —
      // applied directly to the analyzed plan it is a structural no-op
      val analyzed = query.queryExecution.analyzed
      assert(ZOrderPruningRule(analyzed) === analyzed)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("GraftExtensions wires the rule and SQL functions into a fresh session") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // SQL function available without manual registration
      val z = s2.sql("SELECT zorder(3, 5) AS z").collect()(0).getLong(0)
      assert(z === graft.zorder.ZOrder.zorder(3, 5))
      assert(s2.sql(s"SELECT zorder_x($z) AS x, zorder_y($z) AS y").collect()(0)
        .toSeq === Seq(3, 5))
      assert(s2.sql("SELECT sorted_floor(array(1L, 5L, 9L), 7L)").collect()(0)
        .getLong(0) === 5L)
      assert(s2.sql(
        "SELECT simhash_agg(h) FROM VALUES (1L), (3L) AS t(h)").collect()(0)
        .getLong(0) >= 0L)
      // optimizer rule active: x/y filter gains zkey predicate
      val df = s2.read.parquet(storeDir)
        .filter(col("x").between(0, 100) && col("y").between(0, 100))
      assert(df.queryExecution.optimizedPlan.toString.contains("zkey"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("octree arm: x/y/t filters over a marked z3 relation gain interval predicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map(i =>
      (i.toLong, rnd.nextInt(4096), rnd.nextInt(4096), rnd.nextInt(4096)))
    val pts = graft.operators.SpatioTemporal.points3(
      rows.toDF("pid", "px", "py", "pt"),
      col("pid"), col("px"), col("py"), col("pt"))
    def query = pts.filter(col("x").between(100, 300) &&
      col("y").between(1000, 1200) && col("t").between(0, 500))
    spark.experimental.extraOptimizations = Nil
    val expect = query.select("id").collect().map(_.getLong(0)).toSet
    spark.experimental.extraOptimizations = Seq(ZOrderPruningRule)
    try {
      assert(query.queryExecution.optimizedPlan.toString.contains("z3"), "no z3 conjunct")
      val got = query.select("id").collect().map(_.getLong(0)).toSet
      assert(got === expect)
      // a box beyond the 21-bit codec domain bails (wrapping keys would
      // make the conjunct unsound)
      val wide = pts.filter(col("x").between(0, graft.zorder.ZOrder3.MaxCoord + 5) &&
        col("y").between(0, 10) && col("t").between(0, 10))
      val analyzed = wide.queryExecution.analyzed
      assert(ZOrderPruningRule(analyzed) === analyzed)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("pruning skips row groups: pruned scan reads fewer rows than full scan") {
    // with the zkey predicate pushed to Parquet, the filtered scan's
    // output rows (post-pushdown) stay well under the table size
    spark.experimental.extraOptimizations = Seq(ZOrderPruningRule)
    try {
      val df = spark.read.parquet(storeDir)
        .filter(col("x").between(0, 63) && col("y").between(0, 63))
      df.collect()
      val scanned = df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
      assert(scanned < 20000, s"scan emitted $scanned rows — no pruning?")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
