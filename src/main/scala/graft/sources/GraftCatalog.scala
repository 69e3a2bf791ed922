package graft.sources

import org.apache.spark.sql.SparkSession

import graft.functions.GraftFunctions

/**
 * One-call SQL surface: registers every parquet table of a test-data
 * scale directory as a temp view (same names the DuckDB oracle uses)
 * plus the engine's SQL functions — after this, the full query
 * inventory is expressible in plain `spark.sql`.
 */
object GraftCatalog {

  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit = {
    Tables.foreach { t =>
      val path = s"$dir/$t.parquet"
      if (new java.io.File(path).exists()) {
        // events.ts → canonical BIGINT nanos (engine-wide convention)
        val df = spark.read.parquet(path)
        val canon = if (t == "events") EventTime.normalize(df, "ts") else df
        canon.createOrReplaceTempView(t)
      }
    }
    GraftFunctions.register(spark)
  }
}
