package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventTimeSpec extends SparkSpec {

  test("normalize is zone-independent on TIMESTAMP_NTZ input") {
    import spark.implicits._
    val ntz = Seq("2024-01-01 00:00:00.000001", "2024-06-15 12:34:56.789012")
      .toDF("s").select(expr("cast(s as timestamp_ntz)").as("ts"))
    val expected = Seq(1704067200000001000L, 1718454896789012000L)

    def nanos() = EventTime.normalize(ntz, "ts")
      .orderBy("ts").collect().map(_.getLong(0)).toSeq

    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      assert(nanos() === expected) // UTC session (the pinned default)
      // a mis-set session zone must NOT shift the epochs (ADVICE r11)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      assert(nanos() === expected)
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(nanos() === expected)
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("normalize passes BIGINT through and converts zoned TIMESTAMP by epoch") {
    import spark.implicits._
    val asLong = Seq(42L).toDF("ts")
    assert(EventTime.normalize(asLong, "ts").head().getLong(0) === 42L)
    val zoned = Seq("2024-01-01 00:00:00").toDF("s")
      .select(expr("cast(s as timestamp)").as("ts"))
    assert(EventTime.normalize(zoned, "ts").head().getLong(0) === 1704067200000000000L)
  }

  test("GraftCatalog events view: BIGINT ts plus matching ts_ntz instant") {
    GraftCatalog.registerAll(spark, sf("sf0.001"))
    val row = spark.sql(
      """SELECT ts, timestampdiff(MICROSECOND,
        |  TIMESTAMP_NTZ '1970-01-01 00:00:00', ts_ntz) * 1000 AS ntz_nanos
        |FROM events ORDER BY event_id LIMIT 5""".stripMargin).collect()
    row.foreach { r =>
      // micros-precision data: the two spellings carry the same instant
      assert(r.getLong(0) === r.getLong(1))
    }
    assert(row.nonEmpty)
  }
}
