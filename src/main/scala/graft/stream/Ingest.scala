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
  * The three appends additionally run a stage-then-publish commit
  * protocol per (sink, batchId): stage to a batch-scoped dir, publish by
  * renaming each staged file to a DETERMINISTIC per-batch name in its
  * final hourly dir, then drop a commit marker atomically (temp+rename).
  * Because a replay republishes the SAME target names, the protocol
  * converges to exactly-once no matter where a previous attempt died —
  * including the append-to-marker window three plain appends would leave.
  */
object Ingest {

  final case class LakeDirs(raw: String, curated: String, dlq: String,
                            checkpoint: String)

  /** Marker path recording that sink `dir` has committed `batchId`.
    * Underscore-prefixed, so Spark's file index treats it as hidden. */
  private def markerPath(dir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/_graft_commits/batch-$batchId")

  /** Move every staged data file into its final partition dir under a
    * deterministic per-batch name (`batch-<id>-<i>.<ext>`). Deterministic
    * names are what close the append-to-marker crash window: a replay
    * REPLACES its own earlier files instead of appending beside them.
    * Leftover `batch-<id>-*` files from a larger previous attempt are
    * swept per directory before the renames, so the publish is a full
    * overwrite of this batch's contribution and nothing else.
    *
    * DEPLOYMENT SEAM — rename semantics: this loop runs on the driver
    * and assumes rename is an atomic metadata operation, which holds on
    * HDFS, ABFS, and any posix FS. On S3 "rename" is copy+delete, so the
    * loop serializes O(files) object copies AND loses the atomicity the
    * marker protocol's temp+rename relies on — on S3, front this sink
    * with a transactional table format (Delta/Iceberg commit = the same
    * stage-then-publish contract) or an S3-committer-backed path. The
    * loop stays cheap because [[writeBatch]]'s repartition bounds the
    * staged file count to ONE file per (sink, hour-partition) per batch —
    * files-per-publish = hours touched by the batch, not rows
    * (StreamingSpec pins the bound). */
  private def publishStaged(fs: org.apache.hadoop.fs.FileSystem,
                            staging: org.apache.hadoop.fs.Path,
                            targetRoot: org.apache.hadoop.fs.Path,
                            batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    // listStatus returns scheme-qualified paths (file:/…); qualify the
    // roots the same way or the prefix-strip below silently never matches
    val stagingQ = fs.makeQualified(staging)
    val targetQ = fs.makeQualified(targetRoot)
    def walk(p: Path): Seq[Path] = fs.listStatus(p).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Seq.empty
      else if (s.isDirectory) walk(s.getPath) else Seq(s.getPath)
    }
    walk(stagingQ).groupBy(_.getParent).foreach { case (srcDir, files) =>
      val rel = srcDir.toString.stripPrefix(stagingQ.toString).stripPrefix("/")
      require(!rel.contains(":"),
        s"staged path $srcDir does not resolve under $stagingQ")
      val outDir = if (rel.isEmpty) targetQ else new Path(targetQ, rel)
      fs.mkdirs(outDir)
      fs.globStatus(new Path(outDir, s"batch-$batchId-*"))
        .foreach(old => fs.delete(old.getPath, false))
      files.sortBy(_.getName).zipWithIndex.foreach { case (src, i) =>
        val name = src.getName
        val ext = name.lastIndexOf('.') match {
          case -1 => ""
          case d  => name.substring(d)
        }
        fs.rename(src, new Path(outDir, s"batch-$batchId-$i$ext"))
      }
    }
    fs.delete(staging, true)
  }

  /** Commit one sink's share of a batch exactly once. Skip if the marker
    * exists; else stage (full overwrite of the batch-scoped staging dir —
    * replay-safe), publish via deterministic renames, then publish the
    * marker through [[graft.ops.AtomicPublish]] — the same per-store
    * publish-no-overwrite strategy the snapshot manifests ride, so the
    * COMMIT POINT of this protocol is portable to conditional-PUT object
    * stores (a half-created marker can never be read as committed on any
    * supported store class; a replay losing the marker race is benign —
    * the winner published the identical batch). Every crash point replays
    * into the same final state: the data-file publishes use DETERMINISTIC
    * names, so even a store whose rename silently replaces converges (a
    * replay replaces its own earlier files with identical content).
    * `batchId < 0` (direct batch use, tests) bypasses the protocol and
    * appends in place. */
  private def oncePerBatch(spark: SparkSession, dir: String, batchId: Long)
                          (writeTo: (String, SaveMode) => Unit): Unit = {
    if (batchId < 0) { writeTo(dir, SaveMode.Append); return }
    val m = markerPath(dir, batchId)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(m)) return
    val staging = new org.apache.hadoop.fs.Path(s"$dir/_graft_staging/batch-$batchId")
    writeTo(staging.toString, SaveMode.Overwrite)
    publishStaged(fs, staging, new org.apache.hadoop.fs.Path(dir), batchId)
    fs.mkdirs(m.getParent)
    graft.ops.AtomicPublish.publishContent(fs,
      spark.sparkContext.hadoopConfiguration, m.getParent, m,
      s"batch-$batchId"): Unit
  }

  /** Per-batch 3-way fan-out used by the streaming query (and directly
    * testable on a static frame). */
  def writeBatch(batch: DataFrame, dirs: LakeDirs, batchId: Long = -1L): Unit = {
    val spark = batch.sparkSession
    val routed = StreamTransforms.route(StreamTransforms.enrich(
      StreamTransforms.parseWithExtras(batch)))
      .withColumn("p_date", date_format(col("arrival_ts"), "yyyy-MM-dd"))
      .withColumn("p_hour", date_format(col("arrival_ts"), "HH"))
      .repartition(col("p_date"), col("p_hour")) // 1 file per sink per hour dir
      .cache()
    try {
      // raw passthrough (JSONL, hourly dirs)
      oncePerBatch(spark, dirs.raw, batchId) { (out, mode) =>
        routed.select(col("json"), col("p_date"), col("p_hour"))
          .write.mode(mode).partitionBy("p_date", "p_hour").text(out)
      }
      // curated (CSV, positional, headerless — ds_curated_csv.json shape)
      oncePerBatch(spark, dirs.curated, batchId) { (out, mode) =>
        routed.filter(col("sink") === "curated")
          .select(HourLoad.curatedCsvColumnsWire: _*)
          .write.mode(mode).option("header", "false")
          .partitionBy("p_date", "p_hour").csv(out)
      }
      // DLQ (JSONL + reason)
      oncePerBatch(spark, dirs.dlq, batchId) { (out, mode) =>
        routed.filter(col("sink") === "dlq")
          .select(to_json(struct(col("event_id"), col("reason"), col("json"))).as("value"),
            col("p_date"), col("p_hour"))
          .write.mode(mode).partitionBy("p_date", "p_hour").text(out)
      }
    } finally routed.unpersist()
  }

  /** Start the continuous ingest from any [[StreamSource]] — the source
    * seam is where a deployment swaps the sandbox's file landing dir for
    * a message bus (see [[StreamSource]] for the Kafka/Event Hubs swap). */
  def start(spark: SparkSession, source: StreamSource, dirs: LakeDirs,
            trigger: Trigger): StreamingQuery =
    source.load(spark).writeStream
      .option("checkpointLocation", dirs.checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) => writeBatch(batch, dirs, batchId))
      .start()

  /** Convenience: continuous ingest over a JSONL landing dir. */
  def start(spark: SparkSession, inputDir: String, dirs: LakeDirs,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(spark, FileJsonlSource(inputDir), dirs, trigger)
}
