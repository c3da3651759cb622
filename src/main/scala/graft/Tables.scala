package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §A).
  *
  * One parquet file per table under `sfDir`. All timestamps are read in the
  * session time zone (pinned UTC by Verify/Bench/tests) so values agree with
  * the DuckDB oracle, which treats them as naive UTC.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` normalized to TIMESTAMP_NTZ regardless of the fixture's
    * physical type. The driver has shipped `events.parquet#ts` both as
    * TIMESTAMP(NANOS) — surfaced as BIGINT nanos under
    * `spark.sql.legacy.parquet.nanosAsLong` — and as TIMESTAMP(MICROS) —
    * surfaced as TIMESTAMP_NTZ. Dispatch on the schema actually read so
    * either generation yields identical values (the DuckDB oracle's
    * `CAST(ts AS TIMESTAMP)` / `epoch_us(ts)` are precision-agnostic the
    * same way).
    */
  def eventTsNtz(ev: DataFrame): Column = ev.schema("ts").dataType match {
    // integer-div nanos to micros — a double division would lose
    // sub-ms precision at 1.7e18
    case LongType => timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
    case _: TimestampNTZType => col("ts")
    case _: TimestampType => col("ts").cast("timestamp_ntz")
    case other =>
      throw new IllegalStateException(s"unsupported events.ts type: $other")
  }

  /** Epoch microseconds of `events.ts` as BIGINT. Session TZ is pinned UTC
    * (SparkEntry.configure), so NTZ wall time == instant and these are the
    * same integers DuckDB's `epoch_us(ts)` yields. */
  def eventTsMicros(ev: DataFrame): Column = ev.schema("ts").dataType match {
    case LongType => expr("ts div 1000")
    case _ => unix_micros(eventTsNtz(ev).cast("timestamp"))
  }
}
