package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleLayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val a = (1 to 10000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 10000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    ScaleLayout.writeBucketed(a, "bk_a", "k", 8)
    ScaleLayout.writeBucketed(b, "bk_b", "k", 8)
    try {
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === 10000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("salted join equals the plain join on skewed keys") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 20000).map(i =>
      (if (i % 10 != 0) 7L else (i % 100).toLong, i.toLong)).toDF("k", "lv")
    val right = (0 to 99).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k")
    val salted = ScaleLayout.saltedJoin(left, right, "k", 8)
    assert(salted.count() === plain.count())
    val pAgg = plain.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sAgg = salted.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pAgg === sAgg)
  }
}
