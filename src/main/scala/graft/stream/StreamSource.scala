package graft.stream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable unbounded-source seam for the ingest hot path (reference: the
  * ASA job reads an Event Hubs JSON stream, `infra/scripts/asa-wire.sh:53-70`).
  *
  * Everything downstream of the source — parse, enrich, route, the 3-sink
  * commit protocol — only needs an unbounded frame with two columns:
  * `json: string` (the wire envelope) and `arrival_ts: timestamp_ntz`.
  * WHERE those rows stream from is deployment detail, so it lives behind
  * this trait. The sandbox ships [[FileJsonlSource]]; a message-bus
  * deployment swaps one constructor and nothing else changes:
  *
  * {{{
  * // Event Hubs exposes a Kafka-compatible endpoint, so the production
  * // analog is Spark's built-in Kafka source (no extra library beyond
  * // the spark-sql-kafka connector):
  * val bus = new StreamSource {
  *   def load(spark: SparkSession): DataFrame =
  *     spark.readStream.format("kafka")
  *       .option("kafka.bootstrap.servers", "<namespace>:9093")
  *       .option("subscribe", "<hub>")
  *       .option("startingOffsets", "latest")
  *       .load()
  *       .select(col("value").cast("string").as("json"),
  *         col("timestamp").cast("timestamp_ntz").as("arrival_ts"))
  * }
  * Ingest.start(spark, bus, dirs)
  * }}}
  */
trait StreamSource {
  /** The unbounded input frame: `json: string`, `arrival_ts: timestamp_ntz`. */
  def load(spark: SparkSession): DataFrame
}

/** JSONL files landing in a directory — the sandbox stand-in for the bus.
  * Arrival time = producer_ts when present (deterministic tests), else the
  * processing-time stamp — ASA's System.Timestamp analog. */
final case class FileJsonlSource(inputDir: String) extends StreamSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream.text(inputDir)
      .withColumnRenamed("value", "json")
      .withColumn("arrival_ts",
        coalesce(
          get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"),
          current_timestamp().cast("timestamp_ntz")))
}

/** The offset-addressed segment log ([[graft.sources.SegmentLogProvider]])
  * behind the same seam — the in-repo implementation of the message-bus
  * contract (monotonic offsets, reproducible batch planning, exactly-once
  * resume from the checkpoint), so [[Ingest.start]] runs against real
  * offset semantics without a broker. */
final case class SegmentLogStreamSource(dir: String) extends StreamSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream
      .format(classOf[graft.sources.SegmentLogProvider].getName)
      .option("path", dir).load()
      .withColumnRenamed("value", "json")
      .withColumn("arrival_ts",
        coalesce(
          get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"),
          current_timestamp().cast("timestamp_ntz")))
}
