package graft.batch

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Harness-level maintenance ops (SURVEY.md §2.1 `convert_recompress`,
  * `seed_reference_data`; §2.9 stats refresh note).
  *
  * The reference's notebook rewrites ZSTD parquet to Snappy for a reader
  * that can't do ZSTD (nb_convert_parquet_to_snappy cells 0-5). Spark
  * reads ZSTD natively, so the surviving utility is the single-file
  * publish: `coalesce(1)` + snappy + TIMESTAMP_MILLIS + an md5 manifest,
  * with the write going to a tmp dir and renamed into place (atomic-ish
  * publish for non-transactional consumers). */
object Maintenance {

  /** Single-file snappy publish + manifest. Returns (file name, md5). */
  def publishSingleFile(spark: SparkSession, df: DataFrame, outDir: String): (String, String) = {
    val tmp = outDir + "._tmp"
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("compression", "snappy").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val part = fs.listStatus(new Path(tmp))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    // md5 manifest of the single data file
    val md = MessageDigest.getInstance("MD5")
    val in = fs.open(part)
    try {
      val buf = new Array[Byte](1 << 16)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0)
        .foreach(n => md.update(buf, 0, n))
    } finally in.close()
    val md5 = md.digest().map("%02x".format(_)).mkString
    val target = new Path(outDir)
    if (fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(target)
    val finalName = "data.snappy.parquet"
    fs.rename(part, new Path(target, finalName))
    fs.delete(new Path(tmp), true)
    val out = fs.create(new Path(target, "manifest.md5"))
    try out.write(s"$md5  $finalName\n".getBytes("UTF-8")) finally out.close()
    (finalName, md5)
  }

  final case class CompactResult(filesBefore: Int, filesAfter: Int,
                                 bytes: Long, compacted: Boolean)

  /** Small-file compaction for one data directory (typically one hourly
    * partition of the streaming sink, whose micro-batches each leave a
    * part file): rewrite the dir's part files down to
    * ceil(bytes / targetFileBytes) files, rows unchanged.
    *
    * Small files are the silent killer of a 100 TB lake — every reader
    * pays one open/footer-parse per file and the driver pays listing, so
    * a sink that drips 50 KB files needs a compactor running behind it.
    * Already-compact dirs return untouched (compacted = false) so a
    * scheduled sweep is idempotent and cheap.
    *
    * Publish protocol: stage the rewrite to a sibling tmp dir, then
    * swap via two renames (live → ._old, tmp → live) and drop the old
    * dir — the same rename discipline as [[publishSingleFile]]. On a
    * posix-rename lake readers can observe a brief gap between the two
    * renames; a transactional table format closes it, which is exactly
    * why compaction in production rides Delta/Iceberg commits — the
    * REWRITE shape (read dir → coalesce(n) → write) is identical there. */
  def compactDir(spark: SparkSession, dir: String,
                 targetFileBytes: Long): CompactResult = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= nOut)
      return CompactResult(parts.length, parts.length, bytes, compacted = false)
    val tmp = new Path(dir + "._compact_tmp")
    val old = new Path(dir + "._compact_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    // coalesce, not repartition: a narrow merge of input splits — the
    // rewrite never shuffles
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).option("compression", "snappy")
      .parquet(tmp.toString)
    val after = fs.listStatus(tmp)
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compact swap failed: $dir -> $old")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back to the original data
      throw new java.io.IOException(s"compact swap failed: $tmp -> $dir")
    }
    fs.delete(old, true)
    CompactResult(parts.length, after, bytes, compacted = true)
  }

  final case class SnapshotCompactResult(table: String, dirsBefore: Int,
                                         dirsAfter: Int, version: Long)

  /** Transactional compaction sweep over named snapshot tables — the
    * [[compactDir]] shape with its documented torn-rename caveat CLOSED:
    * each fold is one atomic manifest commit
    * ([[graft.ops.SnapshotTable.compact]]), so readers see the old or
    * the new snapshot, never a gap, and a concurrent writer is handled
    * by the commit's rewrite validation instead of a rename race.
    * Already-compact tables commit nothing (idempotent scheduled sweep,
    * like [[retentionPurge]]/[[sweepCommitMarkers]]); pair with each
    * table's `vacuum` to reap the superseded files. */
  def compactSnapshots(tables: Seq[(String, graft.ops.SnapshotTable)])
      : Seq[SnapshotCompactResult] =
    tables.map { case (name, t) =>
      val before = t.liveCommitDirs
      val v = t.compact()
      SnapshotCompactResult(name, before, t.liveCommitDirs, v)
    }

  final case class VacuumResult(kept: Seq[String], removed: Seq[String],
                                dryRun: Boolean)

  /** Orphan-file vacuum: delete data files in `dir` that a failed or
    * killed writer left behind but that no manifest references — the
    * non-transactional lake's VACUUM. The referenced set is the single
    * source of truth (a `manifest.md5` from [[publishSingleFile]], a
    * Delta/Iceberg snapshot in production); anything else matching
    * `part-*` or the writers' staging prefixes is an orphan. `_SUCCESS`,
    * manifests, and unknown non-data files are never touched, and
    * `dryRun = true` only reports — run the sweep in report mode first,
    * exactly like `VACUUM ... DRY RUN`.
    *
    * Driver-side FS listing of ONE directory (same bound as
    * [[compactDir]]): hour-granular dirs keep the listing tiny; a
    * whole-lake sweep iterates dirs, it never lists the lake in one
    * call. */
  def vacuumOrphans(spark: SparkSession, dir: String,
                    referenced: Set[String],
                    dryRun: Boolean = false): VacuumResult = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataLike = fs.listStatus(path).filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.startsWith("part-") || n.startsWith(".part-") ||
        n.startsWith("_temporary") || n.endsWith(".tmp"))
    val (kept, orphans) = dataLike.partition(referenced)
    if (!dryRun) orphans.foreach { n =>
      if (!fs.delete(new Path(path, n), false))
        throw new java.io.IOException(s"vacuum failed to delete $dir/$n")
    }
    VacuumResult(kept.sorted.toSeq, orphans.sorted.toSeq, dryRun)
  }

  final case class PurgeResult(rowsDeleted: Long, partitionsDropped: Seq[String],
                               cutoffDate: java.time.LocalDate)

  /** Retention purge (ref usp_purge_trip_clean_slice.sql:16-25): delete
    * everything with date partition value `< today - keepDays`. Because the
    * target tables are hive-partitioned on their date column (core's
    * `pickup_date`, stg's `p_date`), the DELETE collapses to whole-dir
    * drops — metadata-only, no table rewrite at any scale. Mirrors the
    * proc's contract: rejects keepDays < 1, pre-counts the purged rows,
    * returns (rows_deleted, cutoff_date). NULL-dated partitions are kept,
    * matching SQL `< cutoff` three-valued logic. */
  def retentionPurge(table: graft.ops.PartitionedTableOps, keepDays: Int,
                     today: java.time.LocalDate): PurgeResult = {
    require(keepDays >= 1, "keepDays must be >= 1")
    val cutoff = today.minusDays(keepDays.toLong)
    def isOld(v: Option[String]): Boolean = v.exists { s =>
      scala.util.Try(java.time.LocalDate.parse(s)).toOption.exists(_.isBefore(cutoff))
    }
    // count and drop share ONE directory listing and ONE predicate (isOld):
    // a value Spark could cast but strict ISO parse rejects is counted for
    // neither, and a concurrent writer can't desync count from delete —
    // rowsDeleted always equals the rows actually removed
    val (rows, dropped) =
      if (table.exists) table.purgePartitions(isOld) else (0L, Seq.empty[String])
    PurgeResult(rows, dropped, cutoff)
  }

  /** The post-load statistics targets of `45_postload_stats.sql:7-28`:
    * the six filter/join columns the reference creates one-time stats on.
    * (The reference also refreshes `dim_location`; dims here are derived
    * in-flight and joined with an explicit `broadcast()` hint, so the
    * fact table is the one persisted stats consumer.) */
  val StatsTargets: Map[String, Seq[String]] = Map(
    "fact_trip" -> Seq("pickup_date_key", "vendor_sk", "payment_sk",
      "pu_location_sk", "do_location_sk", "ingest_date"))

  /** Post-load stats refresh (`45_postload_stats.sql:7-28`, "safe to run
    * every slice; idempotent"). Spark analog: register each warehouse dir
    * as an external parquet table in the session catalog, then `ANALYZE
    * TABLE … COMPUTE STATISTICS` (rowcount/size) plus `… FOR COLUMNS` on
    * the reference's six fact keys (NDV/min/max/null counts). Persisted
    * column stats are what let the cost-based optimizer size joins and
    * pick broadcast candidates BEFORE any shuffle materializes — AQE can
    * only re-plan after runtime sizes appear. Each run re-points the
    * external table and recomputes, mirroring UPDATE STATISTICS.
    * Returns the catalog rowcount per analyzed table. */
  def analyzeTables(spark: SparkSession, warehouseDir: String,
                    targets: Map[String, Seq[String]] = StatsTargets): Map[String, Long] =
    targets.flatMap { case (name, cols) =>
      val dir = new Path(s"$warehouseDir/$name")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) None // partial warehouse: analyze what exists
      else {
        // snapshot-committed tables (graft.ops.SnapshotTable): the table
        // root also holds superseded commit dirs — the external table must
        // point at the LATEST snapshot's files, never the root. Full-
        // overwrite warehouse tables have exactly one live dir per version.
        val loc = graft.ops.SnapshotTable.latestDataDirs(spark, dir.toString)
          .collect { case Seq(one) => new Path(one) }.getOrElse(dir)
        spark.sql(s"DROP TABLE IF EXISTS $name") // external: data untouched
        spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$loc'")
        spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
        if (cols.nonEmpty)
          spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
        val stats = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name)).stats
        Some(name -> stats.flatMap(_.rowCount).fold(-1L)(_.toLong))
      }
    }

  final case class MarkerSweepResult(kept: Seq[Long], removed: Seq[Long])

  /** Commit-marker retention for the 3-sink publish protocol
    * ([[graft.stream.Ingest]]): `_graft_commits/batch-<id>` accumulates
    * one tiny marker file per micro-batch FOREVER — a month of 1-minute
    * batches is ~43k files of pure listing drag. A marker's only job is
    * to short-circuit a REPLAY of its batch id, and Structured Streaming
    * replays at most the batches at or after the checkpoint's last
    * committed epoch — so every marker strictly below that watermark
    * (minus whatever safety margin the caller passes) is dead weight.
    * Sweeps markers with id < `keepBelow`; pass the checkpoint's last
    * committed batch id (or that minus a margin). Idempotent, crash-safe
    * (a half-swept dir just sweeps again), and never touches data files.
    * Fold into the same scheduled sweep as [[retentionPurge]] /
    * [[vacuumOrphans]]. */
  def sweepCommitMarkers(spark: SparkSession, sinkDir: String,
                         keepBelow: Long): MarkerSweepResult = {
    val commits = new Path(s"$sinkDir/_graft_commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) return MarkerSweepResult(Nil, Nil)
    val ids = fs.listStatus(commits).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch-") =>
        scala.util.Try(n.stripPrefix("batch-").toLong).toOption }
      .flatten
    val (sweep, keep) = ids.partition(_ < keepBelow)
    sweep.foreach(id => fs.delete(new Path(commits, s"batch-$id"), false))
    MarkerSweepResult(keep.sorted, sweep.sorted)
  }

  final case class LockEventSweepResult(kept: Long, swept: Long)

  /** Retention sweep for the durable lock telemetry (VERDICT r18 #2) —
    * the [[sweepCommitMarkers]] problem rebuilt one directory over:
    * `<warehouse>/_lock_events/` grows one tiny JSON file per
    * takeover/fenced_abort/skew_refusal/usurped_retry forever, and
    * `LaneLock.events` lists the whole dir unboundedly — a month of a
    * churning fleet is pure listing drag. Event files carry their
    * epoch-millis in the NAME (`<ts>-<kind>-<id>.json`), so the sweep is
    * listing + delete — no file reads, no Spark job (the same
    * no-Spark-mid-abort rule the telemetry writes obey). Sweeps events
    * with ts < `keepBelowTs` (caller passes now minus the fleet's
    * forensic retention window); dot-prefixed staging orphans (a writer
    * killed between create and rename) older than the watermark are
    * reaped too. Idempotent and crash-safe: names are unique, a
    * half-swept dir just sweeps again, and a concurrent logEvent's
    * fresh file sorts above any honest watermark. */
  def sweepLockEvents(spark: SparkSession, whDir: String,
                      keepBelowTs: Long): LockEventSweepResult = {
    val dir = new Path(s"$whDir/${graft.lambda.LaneLock.EventsDirName}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return LockEventSweepResult(0L, 0L)
    val entries = fs.listStatus(dir).toSeq.filter(_.isFile).flatMap { st =>
      val n = st.getPath.getName
      scala.util.Try(n.stripPrefix(".").takeWhile(_.isDigit).toLong)
        .toOption.map(ts => (st.getPath, ts))
    }
    val (sweep, keep) = entries.partition(_._2 < keepBelowTs)
    sweep.foreach { case (p, _) => fs.delete(p, false) }
    LockEventSweepResult(keep.size.toLong, sweep.size.toLong)
  }

  /** One file's lifecycle decision: tier it would move to and whether
    * this run deleted it. */
  final case class LifecycleAction(path: String, ageDays: Long, tier: String)
  final case class LifecycleResult(hot: Long, cool: Long,
                                   deleted: Seq[LifecycleAction])

  /** Storage lifecycle tiering — the engine-side analog of the
    * reference's blob management policy
    * (ref: infra/streaming-bicep/modules/storage-lifecycle.bicep:1-40:
    * tierToCool after `coolAfterDays`, delete after `deleteAfterDays`,
    * prefix-scoped). An embedded library cannot retier blobs — that is
    * the store's job — but it CAN own the policy evaluation and the
    * delete action, which is exactly what the dev-hygiene rule exists
    * for. Files under `dir` matching any prefix are classified by
    * modification age: `hot` (untouched), `cool` (reported for the
    * store's tiering), `delete` (removed here, bottom-up like
    * retentionPurge). The decision input is an injected `now` so the
    * policy is testable and replayable — no wall-clock reads.
    *
    * The listing is ONE recursive driver walk (object stores serve this
    * as a flat prefix list); actions are per-file metadata ops. Bounded
    * by file count, which compaction (`compactDir`) keeps proportional
    * to partitions, not rows. */
  def lifecycleTier(spark: SparkSession, dir: String,
                    prefixes: Seq[String], coolAfterDays: Int,
                    deleteAfterDays: Int,
                    now: java.time.Instant): LifecycleResult = {
    require(coolAfterDays >= 0 && deleteAfterDays > coolAfterDays,
      "delete horizon must exceed cool horizon")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify the root so relativize sees the same scheme/authority the
    // listing returns (file: vs schemeless paths never relativize)
    val root = fs.makeQualified(new Path(dir))
    if (!fs.exists(root)) return LifecycleResult(0L, 0L, Nil)
    val it = fs.listFiles(root, true)
    var hot = 0L
    var cool = 0L
    val deleted = Seq.newBuilder[LifecycleAction]
    while (it.hasNext) {
      val f = it.next()
      val rel = root.toUri.relativize(f.getPath.toUri).getPath
      if (prefixes.isEmpty || prefixes.exists(rel.startsWith)) {
        val ageDays = java.time.Duration.between(
          java.time.Instant.ofEpochMilli(f.getModificationTime), now).toDays
        if (ageDays > deleteAfterDays) {
          fs.delete(f.getPath, false)
          deleted += LifecycleAction(rel, ageDays, "delete")
        } else if (ageDays > coolAfterDays) cool += 1
        else hot += 1
      }
    }
    LifecycleResult(hot, cool, deleted.result().sortBy(_.path))
  }

  /** Insert-if-absent unknown member (`err/seed_unknowns.sql:5-47`): every
    * dim carries SK -1 / NK 'UNKNOWN' so fact FK resolution can COALESCE
    * to it without null keys. */
  def withUnknownMember(dim: DataFrame, nkName: String, skName: String): DataFrame = {
    val spark = dim.sparkSession
    import spark.implicits._
    val unknown = Seq(("UNKNOWN", -1)).toDF(nkName, skName)
      .select(col(nkName).cast(dim.schema(nkName).dataType),
        col(skName).cast(dim.schema(skName).dataType))
    // anti-join guards re-seeding (insert-if-absent)
    unknown.join(dim, Seq(skName), "left_anti").unionByName(
      dim.select(col(skName), col(nkName))).select(col(nkName), col(skName))
  }
}
