package graft.stream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The hot path: unbounded JSONL event source → parse/enrich → 3-way
  * routed, hourly-partitioned lake sinks (SURVEY.md §3.2; ref ASA job
  * asa-wire.sh:156-247).
  *
  * One `readStream` over the landing directory; ONE `foreachBatch` writes
  * all three outputs per micro-batch (raw passthrough JSONL, curated CSV,
  * DLQ JSONL with reason), so a batch commits to the three sinks from the
  * same cached routed frame — the Spark equivalent of ASA's three
  * SELECT…INTO over shared CTEs.
  *
  * Scale: the transforms are stateless (no watermark state, no shuffle);
  * sink partitioning is `date=…/hour=…` via `partitionBy`, giving
  * partition-pruned downstream loads. Exactly-once lands on the
  * deterministic-id merge in [[HourLoad]], not sink transactions —
  * mirroring the reference's idempotency model (SURVEY §2.8 late_data).
  * The three appends are additionally guarded by per-(sink, batchId)
  * commit markers, so a foreachBatch retry after a mid-batch crash never
  * double-lands rows in a sink that had already committed that batch.
  */
object Ingest {

  final case class LakeDirs(raw: String, curated: String, dlq: String,
                            checkpoint: String)

  /** Marker path recording that sink `dir` has committed `batchId`.
    * Underscore-prefixed, so Spark's file index treats it as hidden. */
  private def markerPath(dir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/_graft_commits/batch-$batchId")

  /** Run `write` unless this (sink, batchId) already committed, then drop
    * the marker. A foreachBatch retry re-runs ALL sinks of the batch; the
    * markers make each sink's append idempotent, so a sink that committed
    * before a mid-batch crash cannot double-land its rows on replay (the
    * cross-sink atomicity gap of three sequential appends). Remaining
    * window, stated honestly: a crash BETWEEN a sink's append and its
    * marker write replays that one sink — closing it needs a
    * transactional table format; downstream, the deterministic-id merge
    * absorbs curated replays either way. `batchId < 0` (direct batch use,
    * tests) bypasses the protocol. */
  private def oncePerBatch(spark: SparkSession, dir: String, batchId: Long)
                          (write: => Unit): Unit = {
    if (batchId < 0) { write; return }
    val m = markerPath(dir, batchId)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(m)) return
    write
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
  }

  /** Per-batch 3-way fan-out used by the streaming query (and directly
    * testable on a static frame). */
  def writeBatch(batch: DataFrame, dirs: LakeDirs, batchId: Long = -1L): Unit = {
    val spark = batch.sparkSession
    val routed = StreamTransforms.route(StreamTransforms.enrich(
      StreamTransforms.parse(batch)))
      .withColumn("p_date", date_format(col("arrival_ts"), "yyyy-MM-dd"))
      .withColumn("p_hour", date_format(col("arrival_ts"), "HH"))
      .repartition(col("p_date"), col("p_hour")) // 1 file per sink per hour dir
      .cache()
    try {
      // raw passthrough (JSONL, hourly dirs)
      oncePerBatch(spark, dirs.raw, batchId) {
        routed.select(col("json"), col("p_date"), col("p_hour"))
          .write.mode(SaveMode.Append).partitionBy("p_date", "p_hour").text(dirs.raw)
      }
      // curated (CSV, positional, headerless — ds_curated_csv.json shape)
      oncePerBatch(spark, dirs.curated, batchId) {
        routed.filter(col("sink") === "curated")
          .select(HourLoad.curatedCsvColumns: _*)
          .write.mode(SaveMode.Append).option("header", "false")
          .partitionBy("p_date", "p_hour").csv(dirs.curated)
      }
      // DLQ (JSONL + reason)
      oncePerBatch(spark, dirs.dlq, batchId) {
        routed.filter(col("sink") === "dlq")
          .select(to_json(struct(col("event_id"), col("reason"), col("json"))).as("value"),
            col("p_date"), col("p_hour"))
          .write.mode(SaveMode.Append).partitionBy("p_date", "p_hour").text(dirs.dlq)
      }
    } finally routed.unpersist()
  }

  /** Start the continuous ingest over `inputDir` (JSONL files). Arrival
    * time = producer_ts when present (deterministic tests), else the
    * processing-time stamp — ASA's System.Timestamp analog. */
  def start(spark: SparkSession, inputDir: String, dirs: LakeDirs,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val lines = spark.readStream.text(inputDir)
      .withColumnRenamed("value", "json")
      .withColumn("arrival_ts",
        coalesce(
          get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"),
          current_timestamp().cast("timestamp_ntz")))
    lines.writeStream
      .option("checkpointLocation", dirs.checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) => writeBatch(batch, dirs, batchId))
      .start()
  }
}
