package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Event-time normalization. Engine convention: event timestamps are
 * BIGINT epoch NANOSECONDS — the representation the ordered-key design
 * inherits from the reference's KV row keys, and the one every graft
 * time operator computes with ([[graft.streaming.Sessionize]],
 * [[graft.streaming.StreamingIngest.hourlyCounts]], the as-of/band
 * joins).
 *
 * The driver's test data has shipped `events.ts` in two spellings:
 * TIMESTAMP(NANOS) parquet (readable only as BIGINT nanos under
 * `spark.sql.legacy.parquet.nanosAsLong=true`) and, since round 11,
 * TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). [[normalize]]
 * accepts either — plus an already-long column — and yields canonical
 * BIGINT nanos, so operators and queries are agnostic to which vintage
 * of the data they read.
 *
 * TIMESTAMP_NTZ carries no zone, and Spark refuses a direct
 * NTZ→BIGINT cast; the conversion measures the NTZ wall-clock's
 * distance from the NTZ epoch literal with `timestampdiff(MICROSECOND,
 * ...)` — a zone-independent subtraction that yields the same epoch
 * DuckDB's `epoch_ns(ts)` reports for the oracle, regardless of
 * `spark.sql.session.timeZone`. (Zoned TIMESTAMP already stores epoch
 * micros, so `unix_micros` is likewise zone-independent there.)
 */
object EventTime {

  /** Rewrite each named column (that exists) to BIGINT epoch nanos. */
  def normalize(df: DataFrame, cols: String*): DataFrame =
    cols.filter(c => df.columns.contains(c)).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType => d // already canonical
        case TimestampType =>
          d.withColumn(c, unix_micros(col(c)) * lit(1000L))
        case TimestampNTZType =>
          // wall-clock minus NTZ epoch: no session-zone dependence
          d.withColumn(c, expr(
            s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `$c`) * 1000"))
        case other =>
          throw new IllegalArgumentException(
            s"column $c: expected BIGINT nanos or a timestamp, got $other")
      }
    }

  /** The events table of a scale directory, `ts` in canonical nanos. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalize(spark.read.parquet(s"$dir/events.parquet"), "ts")
}
