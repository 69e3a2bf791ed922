package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventories live in per-domain registries (PointQueries, …);
  * this object aggregates them. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * kNN over part-derived points — part.parquet carries no nano
    * timestamps, so this runs under any session config. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PointQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++ EmbeddingQueries.queries ++ MultimodalQueries.queries ++ StreamingQueries.queries ++ SqlQueries.queries ++ CurationQueries.queries ++ HtmlQueries.queries ++ ClassifierQueries.queries ++ SketchQueries.queries ++ FusionQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    PointQueries.oracle ++ RelationalQueries.oracle ++ TextQueries.oracle ++ EmbeddingQueries.oracle ++ MultimodalQueries.oracle ++ StreamingQueries.oracle ++ SqlQueries.oracle ++ CurationQueries.oracle ++ HtmlQueries.oracle ++ ClassifierQueries.oracle ++ SketchQueries.oracle ++ FusionQueries.oracle ++ AnalyticsQueries.oracle
}
