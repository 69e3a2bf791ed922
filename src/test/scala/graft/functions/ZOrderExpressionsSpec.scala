package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.zorder.ZOrder

class ZOrderExpressionsSpec extends SparkSpec {
  import GraftFunctions._

  test("zorder expression matches the pure codec on random coordinates") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(2000)((rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue))) ++
      Seq((0, 0), (Int.MaxValue, Int.MaxValue), (0, Int.MaxValue), (1, 2))
    val df = pts.toDF("x", "y").withColumn("z", zorder(col("x"), col("y")))
    val bad = df.collect().count { r =>
      r.getLong(2) != ZOrder.zorder(r.getInt(0), r.getInt(1))
    }
    assert(bad === 0)
  }

  test("zorder_x / zorder_y invert zorder inside a Spark plan") {
    import spark.implicits._
    val df = Seq((123, 456), (0, Int.MaxValue), (7, 7)).toDF("x", "y")
      .withColumn("z", zorder(col("x"), col("y")))
      .withColumn("rx", zorder_x(col("z")))
      .withColumn("ry", zorder_y(col("z")))
    assert(df.filter(col("rx") =!= col("x") || col("ry") =!= col("y")).count() === 0)
  }

  test("zorder participates in whole-stage codegen (no fallback)") {
    import spark.implicits._
    // a real file scan so constant folding can't erase the expression
    val df = spark.read.parquet(sf() + "/part.parquet")
      .select(zorder(col("p_size"), floor(col("p_retailprice")).cast("int")).as("z"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("zorder"), plan)
    // and the generated code actually compiles and runs
    assert(df.agg(min(col("z"))).as[Long].head() >= 0L)
  }

  test("zorder3 expressions invert in a plan, stay codegen'd, and reach SQL") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val m = graft.zorder.ZOrder3.MaxCoord
    val pts = Seq.fill(500)((rnd.nextInt(m + 1), rnd.nextInt(m + 1), rnd.nextInt(m + 1))) ++
      Seq((0, 0, 0), (m, m, m), (1, 2, 3))
    val df = pts.toDF("x", "y", "t")
      .withColumn("z", zorder3(col("x"), col("y"), col("t")))
      .withColumn("rx", zorder3_x(col("z")))
      .withColumn("ry", zorder3_y(col("z")))
      .withColumn("rt", zorder3_t(col("z")))
    assert(df.filter(col("rx") =!= col("x") || col("ry") =!= col("y") ||
      col("rt") =!= col("t")).count() === 0)
    val planned = spark.read.parquet(sf() + "/part.parquet")
      .select(zorder3(col("p_size"), floor(col("p_retailprice")).cast("int"),
        col("p_partkey").cast("int")).as("z"))
    assert(planned.queryExecution.executedPlan.toString.contains("*(1) Project"))
    // SQL-string path via the session registration
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT zorder3_x(zorder3(5, 9, 1000)) AS x, zorder3_y(zorder3(5, 9, 1000)) AS y, zorder3_t(zorder3(5, 9, 1000)) AS t")
      .head
    assert((viaSql.getInt(0), viaSql.getInt(1), viaSql.getInt(2)) == ((5, 9, 1000)))
  }

  test("null propagation: null input gives null key") {
    val df = spark.sql("SELECT cast(null as int) as x, 3 as y")
      .select(zorder(col("x"), col("y")).as("z"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("SQL registration: zorder usable from spark.sql") {
    GraftFunctions.register(spark)
    val z = spark.sql("SELECT zorder(6, 9) AS z").collect()(0).getLong(0)
    assert(z === ZOrder.zorder(6, 9))
    assert(spark.sql(s"SELECT zorder_x($z), zorder_y($z)").collect()(0) ===
      org.apache.spark.sql.Row(6, 9))
  }

  test("bucket_key / bucket_name match the codec math") {
    import spark.implicits._
    val z = ZOrder.zorder(6, 949)
    val df = Seq(z).toDF("z")
      .select(bucket_key(col("z"), 10).as("bk"), bucket_name(col("z"), 10).as("bn"))
    val row = df.collect()(0)
    assert(row.getLong(0) === ZOrder.bucketMin(z, 10))
    assert(row.getString(1) === ZOrder.bucketName(z, 10))
  }

  test("dist2 is exact Long arithmetic") {
    import spark.implicits._
    val df = Seq((0, 0), (3, 4), (Int.MaxValue, 0)).toDF("x", "y")
      .select(dist2(col("x"), col("y"), 0, 0).as("d"))
    val got = df.as[Long].collect().sorted
    val expect = Seq(0L, 25L, Int.MaxValue.toLong * Int.MaxValue).sorted
    assert(got.toSeq === expect)
  }
}
