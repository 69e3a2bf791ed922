package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotLongSpec extends SparkSpec {

  test("dot_long equals the higher-order-function formulation on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((
      Array.fill(64)(rnd.nextInt(2000000).toLong - 1000000),
      Array.fill(64)(rnd.nextInt(2000000).toLong - 1000000)))
    val df = rows.toDF("a", "b")
      .withColumn("fused", GraftFunctions.dot_long(col("a"), col("b")))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as bigint), (acc, z) -> acc + z)"))
    assert(df.filter(col("fused") =!= col("hof")).count() === 0)
  }

  test("dot_long: null input propagates, empty arrays give 0, codegen active") {
    import spark.implicits._
    val df = spark.sql(
      "SELECT cast(null as array<bigint>) a, array(1L, 2L) b")
      .select(GraftFunctions.dot_long(col("a"), col("b")).as("d"))
    assert(df.collect()(0).isNullAt(0))
    val empty = Seq((Array.empty[Long], Array.empty[Long])).toDF("a", "b")
      .select(GraftFunctions.dot_long(col("a"), col("b")).as("d"))
    assert(empty.head().getLong(0) === 0L)
    // through a real scan: stays in a codegen stage
    val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val pairs = graft.operators.Similarity.intEmbeddings(emb).limit(10)
    val plan = pairs.select(GraftFunctions.dot_long(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("dot_long"), plan)
    assert(plan.contains("*("), plan)
  }

  test("dot_long usable from SQL via extensions registration") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT dot_long(array(1L,2L,3L), array(4L,5L,6L)) AS d")
      .head().getLong(0) === 32L)
  }
}
