package graft.sources

import org.apache.spark.sql.SparkSession

import graft.functions.GraftFunctions

/**
 * One-call SQL surface: registers every parquet table of a test-data
 * scale directory as a temp view (same names the DuckDB oracle uses)
 * plus the engine's SQL functions — after this, the full query
 * inventory is expressible in plain `spark.sql`.
 *
 * Timestamp convention: the `events` view exposes `ts` as BIGINT epoch
 * NANOSECONDS (the engine-wide canonical event time, see
 * [[graft.sources.EventTime]]) — NOT the TIMESTAMP the DuckDB oracle's
 * raw view carries. User SQL that needs timestamp semantics should use
 * the additional `ts_ntz` column (TIMESTAMP_NTZ, same instant), which
 * matches the oracle's `ts` type; applying timestamp functions directly
 * to the BIGINT `ts` is a type error rather than a silent divergence.
 */
object GraftCatalog {

  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit = {
    Tables.foreach { t =>
      val path = s"$dir/$t.parquet"
      if (new java.io.File(path).exists()) {
        // events.ts → canonical BIGINT nanos (engine-wide convention);
        // ts_ntz carries the same instant as TIMESTAMP_NTZ for user SQL
        // that wants timestamp functions (parity with the oracle's view)
        val df = spark.read.parquet(path)
        val canon =
          if (t == "events")
            EventTime.normalize(df, "ts").withColumn("ts_ntz",
              org.apache.spark.sql.functions.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
          else df
        canon.createOrReplaceTempView(t)
      }
    }
    GraftFunctions.register(spark)
  }
}
