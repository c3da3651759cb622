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
  * this trait. The sandbox ships [[FileJsonlSource]] and
  * [[SegmentLogStreamSource]]; a message-bus deployment swaps one
  * constructor and nothing else changes (Event Hubs exposes a
  * Kafka-compatible endpoint, so the production analog is
  * [[KafkaJsonSource]]):
  *
  * {{{
  * Ingest.start(spark, KafkaJsonSource("<namespace>:9093", "<hub>"), dirs)
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

/** The Kafka/Event Hubs production source behind the same seam — the
  * standard Spark Kafka reader projected onto the two-column wire
  * contract. Compile-checked here (the DataSource V2 lookup is
  * string-addressed, so this builds against spark-sql alone); RUNNING it
  * additionally needs the `spark-sql-kafka-0-10` connector on the
  * classpath, which this sandbox cannot resolve offline — the gap is
  * recorded in README §limitations, and [[SegmentLogStreamSource]] below
  * is the in-repo implementation of the same offset contract that the
  * streaming specs exercise end to end.
  *
  * `arrival_ts` prefers the producer's own stamp from the envelope (late
  * data stays late through a replay, the watermark semantics the ASA
  * System.Timestamp analog requires) and falls back to the broker's
  * append time — NOT processing time, so a backfilled partition
  * re-windows identically.
  *
  * @param maxOffsetsPerTrigger backpressure at 100 TB scale: bounds each
  *   micro-batch so one lagging consumer group restart cannot plan a
  *   multi-TB batch; None = Spark default (unbounded catch-up). */
final case class KafkaJsonSource(bootstrapServers: String, topic: String,
                                 startingOffsets: String = "latest",
                                 maxOffsetsPerTrigger: Option[Long] = None)
    extends StreamSource {
  /** The reader option map, factored out so the backpressure wiring is
    * assertable in a spec without a broker on the classpath. */
  def readerOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets) ++
    maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)

  override def load(spark: SparkSession): DataFrame =
    KafkaJsonSource.projectWire(
      spark.readStream.format("kafka").options(readerOptions).load())
}

object KafkaJsonSource {
  /** Projects a Kafka-shaped frame (`value: binary`, `timestamp: the
    * broker append time`) onto the two-column wire contract. Factored out
    * of [[KafkaJsonSource.load]] so the producer_ts/broker_ts coalesce
    * fallback — the late-data-stays-late semantics — executes in specs
    * against a Kafka-shaped file-backed frame even though the connector
    * jar itself is absent offline. */
  def projectWire(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame
      .select(col("value").cast("string").as("json"),
        col("timestamp").cast("timestamp_ntz").as("broker_ts"))
      .withColumn("arrival_ts",
        coalesce(
          get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"),
          col("broker_ts")))
      .drop("broker_ts")
}

/** The offset-addressed segment log ([[graft.sources.SegmentLogProvider]])
  * behind the same seam — the in-repo implementation of the message-bus
  * contract (monotonic offsets, reproducible batch planning, exactly-once
  * resume from the checkpoint), so [[Ingest.start]] runs against real
  * offset semantics without a broker. `maxSegmentsPerTrigger` is the
  * admission-control knob ([[KafkaStreamSource.readerOptions]]'s
  * `maxOffsetsPerTrigger` analog): a restart over a deep backlog drains
  * in bounded batches instead of planning one giant one. */
final case class SegmentLogStreamSource(dir: String,
    maxSegmentsPerTrigger: Option[Int] = None) extends StreamSource {
  override def load(spark: SparkSession): DataFrame =
    maxSegmentsPerTrigger.foldLeft(
      spark.readStream
        .format(classOf[graft.sources.SegmentLogProvider].getName)
        .option("path", dir))((r, n) =>
      r.option("maxSegmentsPerTrigger", n.toString)).load()
      .withColumnRenamed("value", "json")
      .withColumn("arrival_ts",
        coalesce(
          get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"),
          current_timestamp().cast("timestamp_ntz")))
}
