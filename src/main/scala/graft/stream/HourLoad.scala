package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ops.SnapshotTable

/** Lake → warehouse hourly micro-batch (SURVEY.md §3.3; ref
  * pl_streaming_curated_to_stg_core_mdl.json + the five streaming procs).
  *
  * Per completed hour: check the folder exists (skip if absent) → per-file
  * idempotent staging load (DELETE by `_blobPath` then append, ref
  * 0005_delete.sql — realized as a dynamic overwrite of the hour's own
  * (p_date, p_hour) stg partition, O(hour) not O(stg)) with one audit row
  * per copied blob (ref 0006_LogSuccess.sql:3-17) → run-scoped slice
  * rebuild with the
  * deterministic hash64 trip id + winner-pick dedupe → update-then-insert
  * merge into `core_trip_clean` keyed on trip_id, returning (inserted,
  * updated, total) (the documented contract of
  * usp_upsert_fact_trip_streaming) → slice purge → audit rows.
  *
  * Scale design — the merge is PARTITION-SCOPED, O(hour) not O(table):
  * `core_trip_clean` is hive-partitioned by `pickup_date` and `fact_trip`
  * by `pickup_date_key`, and each hourly merge (a) reads only the target
  * partitions whose dates appear in the slice (partition-pruned scan),
  * (b) full-outer-joins the slice against just that subset, and (c)
  * commits via an ATOMIC dynamic partition overwrite on the
  * manifest-committed [[graft.ops.SnapshotTable]] — untouched date
  * partitions are never read or rewritten, and the single manifest
  * publish flips every touched partition at once, so a concurrent reader
  * sees the whole pre-merge table or the whole post-merge table, never a
  * torn mix (the MERGE atomicity the reference gets from its warehouse,
  * usp_upsert_trip_clean_from_slice_streaming.sql:11-57; proven by
  * StreamingSpec's mid-merge reader). The partition key is `pickup_date` rather
  * than the reference's `ingest_date` column because the merge key
  * `trip_id` hashes `event_id|pickupISO|dropoffISO`
  * (usp_upsert_trips_from_streaming.sql:14-16): pickup_date is
  * functionally determined by the key, so a replayed or late-duplicated
  * trip always lands in the SAME partition and the scoped merge is exactly
  * as correct as a whole-table merge. `ingest_date` (wall-clock, ref
  * usp_upsert_trips_from_streaming.sql:35) is carried as a plain column
  * for lineage and retention.
  *
  * Merge semantics follow the reference UPDATE-all-columns contract
  * (usp_upsert_trip_clean_from_slice_streaming.sql:37-44): row existence
  * comes from explicit join-side markers, and a matched row takes EVERY
  * column from the source — a NULL in a re-delivered source row DOES
  * overwrite the target value, never mixes the two rows.
  *
  * Replays/backfills are absorbed by the deterministic key: re-running any
  * hour is a no-op on `core` (tests assert this). `runRange` is the
  * backfill loop (pl_streaming_backfill_range.json Until1).
  */
object HourLoad {

  /** Curated CSV column set (positional, headerless) + hour partition
    * columns, in staging order. Doubles/timestamps rendered via cast —
    * exact round trip. */
  val curatedCsvColumns: Seq[Column] = Seq(
    col("event_id").cast("string").as("c_event_id"),
    col("vendor_id").as("c_vendor_id"),
    date_format(col("pickup_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("c_pickup"),
    date_format(col("dropoff_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("c_dropoff"),
    col("passenger_count").cast("string").as("c_passengers"),
    col("trip_distance").cast("string").as("c_distance"),
    col("fare_amount").cast("string").as("c_fare"),
    col("tip_amount").cast("string").as("c_tip"),
    col("total_amount").cast("string").as("c_total"),
    col("payment_type").as("c_payment"),
    date_format(col("producer_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("c_producer"),
    col("p_date"), col("p_hour"))

  /** The curated files' schema. `c_extras` (trailing) is the wire-drift
    * column (VERDICT r18 #4): a JSON object of the unknown keys the
    * ingest parse captured, NULL for drift-free rows — and trailing so
    * PRE-drift files (11 columns) keep reading under this 12-column
    * schema with NULL extras (CSV pads missing trailing fields); the
    * curated lake needs no rewrite when drift capture lands. */
  val curatedReadSchema: StructType = StructType.fromDDL(
    "c_event_id STRING, c_vendor_id STRING, c_pickup STRING, c_dropoff STRING, " +
      "c_passengers STRING, c_distance STRING, c_fare STRING, c_tip STRING, " +
      "c_total STRING, c_payment STRING, c_producer STRING, c_extras STRING")

  /** [[curatedCsvColumns]] + the trailing `c_extras` drift column — the
    * layout [[graft.stream.Ingest]] actually writes (expects the
    * `_extras` column [[StreamTransforms.parseWithExtras]] adds). */
  val curatedCsvColumnsWire: Seq[Column] =
    curatedCsvColumns.dropRight(2) ++
      Seq(col("_extras").as("c_extras"), col("p_date"), col("p_hour"))

  /** Staging schema. `p_date`/`p_hour` (the curated lake's hour coordinates)
    * are ALSO the table's partition keys: the per-blob idempotent reload of
    * an hour then rewrites exactly that hour's partition dir — O(hour), not
    * O(stg) — and retention purges are metadata-only `p_date=` dir drops. */
  val stgSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, vendor_id STRING, pickup_ts TIMESTAMP_NTZ, " +
      "dropoff_ts TIMESTAMP_NTZ, passenger_count BIGINT, trip_distance DOUBLE, " +
      "fare_amount DOUBLE, tip_amount DOUBLE, total_amount DOUBLE, " +
      "payment_type STRING, producer_ts TIMESTAMP_NTZ, " +
      "_runId STRING, _blobPath STRING, _ingestedAt TIMESTAMP_NTZ, " +
      "p_date STRING, p_hour STRING")

  /** Core columns: staging + trip_id + ingest_date (lineage/retention, ref
    * usp_upsert_trips_from_streaming.sql:35) + pickup_date (the partition
    * key — see class doc). */
  val coreSchema: StructType = StructType.fromDDL(
    "trip_id BIGINT, event_id BIGINT, vendor_id STRING, " +
      "pickup_ts TIMESTAMP_NTZ, dropoff_ts TIMESTAMP_NTZ, passenger_count BIGINT, " +
      "trip_distance DOUBLE, fare_amount DOUBLE, tip_amount DOUBLE, " +
      "total_amount DOUBLE, payment_type STRING, producer_ts TIMESTAMP_NTZ, " +
      "_runId STRING, _blobPath STRING, _ingestedAt TIMESTAMP_NTZ, " +
      "ingest_date DATE, pickup_date DATE")

  val dimVendorSchema: StructType = StructType.fromDDL(
    "vendor_nk STRING, vendor_sk INT")

  val factSchema: StructType = StructType.fromDDL(
    "trip_id BIGINT, vendor_sk INT, fare_amount DOUBLE, " +
      "tip_amount DOUBLE, total_amount DOUBLE, _runId STRING, " +
      "pickup_date_key INT")

  val auditSchema: StructType = StructType.fromDDL(
    "run_id STRING, p_date STRING, p_hour STRING, files BIGINT, " +
      "rows_copied BIGINT, inserted BIGINT, updated BIGINT, total BIGINT")

  /** Per-blob ingest audit (ref stg.usp_log_ingest,
    * sql/streaming/staging/0006_LogSuccess.sql:3-17 + 0004_Audit_table.sql):
    * one row per copied file so file-level forensics ("which blob
    * double-loaded?") stay reconstructable. */
  val fileAuditSchema: StructType = StructType.fromDDL(
    "run_id STRING, p_date STRING, p_hour STRING, blob_path STRING, " +
      "rows_copied BIGINT, status STRING")

  /** All warehouse tables ride the manifest-committed snapshot layer:
    * every stage boundary is one atomic manifest publish, concurrent
    * readers get version isolation, and retention purges are metadata-only
    * commits (data files reaped later by vacuum). */
  final case class Warehouse(spark: SparkSession, dir: String) {
    val stg: SnapshotTable =
      SnapshotTable(spark, s"$dir/stg_trips_streaming", stgSchema, Seq("p_date", "p_hour"))
    val slice: SnapshotTable = SnapshotTable(spark, s"$dir/core_trip_clean_slice", coreSchema)
    val core: SnapshotTable =
      SnapshotTable(spark, s"$dir/core_trip_clean", coreSchema, Seq("pickup_date"))
    val dimVendor: SnapshotTable = SnapshotTable(spark, s"$dir/dim_vendor", dimVendorSchema)
    val fact: SnapshotTable =
      SnapshotTable(spark, s"$dir/fact_trip", factSchema, Seq("pickup_date_key"))
    val audit: SnapshotTable = SnapshotTable(spark, s"$dir/ingest_audit", auditSchema)
    val fileAudit: SnapshotTable =
      SnapshotTable(spark, s"$dir/ingest_file_audit", fileAuditSchema)
  }

  final case class HourResult(files: Long, rowsCopied: Long, inserted: Long,
                              updated: Long, total: Long)

  /** Outcome of the lane-local staging half of an hour load (blob copy +
    * slice build), shared by the standalone stream warehouse and the
    * dual-lane shared star ([[graft.lambda.Lambda]]). */
  private[graft] final case class StagedHour(files: Long, rowsCopied: Long,
                                             perBlob: Seq[(String, Long)])

  /** CopyCuratedToStg + slice build (the first two streaming procs:
    * per-blob idempotent staging reload, ref 0005_delete.sql +
    * 0006_LogSuccess.sql, then usp_build_trip_clean_slice_streaming's
    * hash-id + winner-pick dedupe). Returns None — and performs no
    * writes — when the hour folder is absent. Extracted from [[runHour]]
    * unchanged so the SAME staging semantics feed both the stream-only
    * warehouse and the lambda shared star; everything after the slice
    * (which tables the merge targets, and in what schema) is what the
    * two warehouses legitimately differ on. */
  private[graft] def stageHourAndSlice(spark: SparkSession, stg: SnapshotTable,
      slice: SnapshotTable, curatedDir: String, date: String, hour: String,
      runId: String): Option[StagedHour] = {
    val hourPath = s"$curatedDir/p_date=$date/p_hour=$hour"
    val fs = new Path(hourPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(hourPath))) return None // skip absent hour

    // CopyCuratedToStg: positional read + lineage + per-blob idempotent delete
    val raw = spark.read.schema(curatedReadSchema).option("header", "false")
      .csv(hourPath)
      .withColumn("_blobPath", input_file_name())
    val typed = raw.select(
      col("c_event_id").cast("bigint").as("event_id"),
      col("c_vendor_id").as("vendor_id"),
      col("c_pickup").cast("timestamp_ntz").as("pickup_ts"),
      col("c_dropoff").cast("timestamp_ntz").as("dropoff_ts"),
      col("c_passengers").cast("bigint").as("passenger_count"),
      col("c_distance").cast("double").as("trip_distance"),
      col("c_fare").cast("double").as("fare_amount"),
      col("c_tip").cast("double").as("tip_amount"),
      col("c_total").cast("double").as("total_amount"),
      col("c_payment").as("payment_type"),
      col("c_producer").cast("timestamp_ntz").as("producer_ts"),
      lit(runId).as("_runId"),
      col("_blobPath"),
      current_timestamp().cast("timestamp_ntz").as("_ingestedAt"),
      lit(date).as("p_date"), lit(hour).as("p_hour"),
      col("c_extras"))
    // wire-drift expansion (VERDICT r18 #4): the hour's unknown wire keys
    // (the c_extras JSON the ingest captured) become x_<key> STRING
    // columns on the staged frame, and staging/slice/core then evolve
    // ADDITIVELY through the snapshot layer's superset-write machinery —
    // a new key mid-stream is an ALTER, no operator step, and pre-drift
    // rows read NULL. The key set is one tiny per-hour aggregate (bounded
    // by the wire's drift vocabulary, never by rows); a key that cannot
    // be a column name refuses loudly rather than silently dropping data.
    val extrasMap = from_json(col("c_extras"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    val driftKeys = typed.select(explode(map_keys(extrasMap)).as("k"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val unsafe = driftKeys.filterNot(_.matches("[A-Za-z][A-Za-z0-9_]*"))
    require(unsafe.isEmpty,
      s"wire drift keys not expressible as staging columns: $unsafe")
    val expanded = driftKeys.foldLeft(typed)((df, k) =>
      df.withColumn(s"x_$k", element_at(extrasMap, k))).drop("c_extras")
    val typedF = expanded
    // one job yields the blob list AND the per-blob counts (lineage_inject)
    val perBlob = typedF.groupBy("_blobPath").agg(count(lit(1)).as("rows"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val blobs = perBlob.map(_._1)
    // Per-blob idempotent reload, partition-scoped (ref 0005_delete.sql):
    // see the class doc — survivors from other blobs of the same hour +
    // the fresh copy, via a manifest-pruned read of this hour only.
    val hourKey = s"p_date=$date/p_hour=$hour"
    val survivors = stg.readPartitions(_ == hourKey)
      .filter(!col("_blobPath").isin(blobs: _*))
    // allowMissingColumns both ways: drift widens the fresh copy past the
    // survivors (they NULL-pad), and a later drift-free hour is narrower
    // than an already-evolved staging table
    stg.overwritePartitions(
      survivors.unionByName(typedF, allowMissingColumns = true))

    // usp_build_trip_clean_slice_streaming: run-scoped slice, hash id,
    // dedupe. The manifest-pruned read plans this hour's dirs only.
    val staged = stg.readPartitions(_ == hourKey)
      .filter(col("_runId") === runId)
      .withColumn("trip_id", StreamTransforms.streamTripId)
    val w = Window.partitionBy(col("trip_id"))
      .orderBy(col("producer_ts").desc, col("_ingestedAt").desc, col("_blobPath").desc)
    val sliceDf = staged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("ingest_date", col("_ingestedAt").cast("date"))
      .withColumn("pickup_date", to_date(col("pickup_ts")))
    slice.deleteWhere(col("_runId") === runId)
    slice.append(sliceDf)
    Some(StagedHour(blobs.length.toLong, perBlob.map(_._2).sum, perBlob))
  }

  /** Update-then-insert merge of `staged` into the partitions of `target`
    * that share `staged`'s values of `partCol` (all on `trip_id`).
    * Returns (inserted, updated) and commits via the snapshot table's
    * ATOMIC dynamic partition overwrite — untouched partitions are never
    * read or written, and readers see the merge all-or-nothing.
    *
    * Column semantics: explicit existence markers per join side; a matched
    * row takes every column from the source (reference UPDATE-all-columns,
    * usp_upsert_trip_clean_from_slice_streaming.sql:37-44). */
  private[graft] def scopedMerge(table: SnapshotTable, staged: DataFrame,
                                 partCol: String,
                                 fence: () => Unit = () => ()): (Long, Long) = {
    // Encode the staged partition values with Spark's OWN partition-path
    // formatting: the writer builds `col=v` fragments by SQL-casting the
    // value to string (PartitioningUtils.getPathFragment), so the same
    // cast here is the only encoding that round-trips for EVERY key type.
    // JVM-side toString does not — java.sql.Timestamp appends ".0", so a
    // TIMESTAMP-partitioned merge would match no target dir, read an
    // empty target, misclassify every row as an insert, and the partition
    // overwrite would silently drop existing unmatched rows.
    val partVals = staged.select(col(partCol).cast("string"))
      .distinct().collect().map(r => Option(r.getString(0)))
    val keepVals = partVals.flatten.toSet
    val hasNull = partVals.contains(None)
    var result: Option[(Long, Long)] = None
    while (result.isEmpty) {
      // optimistic read-merge-write: the target subset is pinned at the
      // base version and the commit CAS-validates every touched partition
      // against it (overwritePartitionsCas) — a concurrent writer to the
      // same partition makes THIS merge re-derive and retry rather than
      // either side silently losing the race (two unserialized writers
      // are now serializable; the lambda lane lock above this is
      // throughput hygiene, not the correctness floor)
      val base = table.latestVersion
      // manifest-pruned target subset: the merge plan references ONLY the
      // commit dirs owning the touched partitions, so per-merge planning
      // is O(touched), not O(table history)
      val target = table.readPartitionsByFirstValueAt(base, {
        case Some(v) => keepVals.contains(v)
        case None    => hasNull
      })

      val sEx = col("s._s_exists").isNotNull
      val tEx = col("t._t_exists").isNotNull
      val joined = staged.withColumn("_s_exists", lit(true)).as("s")
        .join(target.withColumn("_t_exists", lit(true)).as("t"),
          col("s.trip_id") === col("t.trip_id"), "full_outer")
        .persist()
      // unpersist in finally: fence() is DESIGNED to throw on usurpation
      // (LockLostException), and a leaked cache entry per aborted merge
      // would accumulate for the life of a long-running session
      try {
        // project against the schema in effect AT the pinned base (never
        // the constructor schema — on an evolved table that would silently
        // DROP evolved columns from every merged partition), widened by
        // any additive drift the staged frame carries (the commit then
        // evolves the table in the same CAS publish). Either side may be
        // narrower: an old-shape producer's rows NULL-pad the columns it
        // doesn't know — reference UPDATE-all-columns semantics over a
        // drift-tolerant staging table (stg_trip.sql:38-111)
        val eff = base.map(table.schemaAt).getOrElse(table.schema)
        val proj = graft.ops.SchemaEvolution.additiveTarget(eff, staged.schema)
        val stagedCols = staged.columns.toSet
        val effCols = eff.fieldNames.toSet
        val merged = joined.select(
          coalesce(col("s.trip_id"), col("t.trip_id")).as("trip_id") +:
            proj.fields.toSeq.filterNot(_.name == "trip_id").map { f =>
              val sSide = if (stagedCols(f.name)) col(s"s.${f.name}")
                          else lit(null).cast(f.dataType)
              val tSide = if (effCols(f.name)) col(s"t.${f.name}")
                          else lit(null).cast(f.dataType)
              when(sEx, sSide).otherwise(tSide).as(f.name)
            }: _*)
        val actions = joined.select(
          when(sEx && tEx, "updated").when(sEx, "inserted").otherwise("unchanged").as("a"))
          .groupBy("a").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // snapshot commit: the overwrite job reads immutable old-version
        // files that the commit never deletes — no defensive staging pass
        // needed (the ParquetTable-era hazard of a re-read racing the
        // delete+rewrite is structurally gone)
        fence() // abort-before-publish if the caller's lane lock was usurped
        if (table.overwritePartitionsCas(merged, base).isDefined)
          result = Some((actions.getOrElse("inserted", 0L),
            actions.getOrElse("updated", 0L)))
      } finally joined.unpersist(): Unit
    }
    result.get
  }

  /** Load one completed hour. Returns the merge counts; zero result (and
    * no writes) if the hour folder is absent. */
  def runHour(wh: Warehouse, curatedDir: String, date: String, hour: String,
              runId: String): HourResult = {
    val spark = wh.spark
    val stagedHour = stageHourAndSlice(spark, wh.stg, wh.slice,
      curatedDir, date, hour, runId)
      .getOrElse(return HourResult(0, 0, 0, 0, 0)) // skip absent hour
    val perBlob = stagedHour.perBlob
    val files = stagedHour.files
    val rowsCopied = stagedHour.rowsCopied

    // usp_upsert_trip_clean_from_slice_streaming: partition-scoped
    // update-then-insert merge (see class doc)
    val stagedSlice = wh.slice.read.filter(col("_runId") === runId)
    val (inserted, updated) = scopedMerge(wh.core, stagedSlice, "pickup_date")

    // usp_upsert_dims_from_slice_streaming: anti-join append of novel NKs
    // (SKs continue after max; existing SKs never move). Dim is tiny —
    // full overwrite is the right commit.
    val sliceForMdl = wh.slice.read.filter(col("_runId") === runId)
    val upsertedDim = graft.batch.StarModel.upsertDim(
      wh.dimVendor.read, sliceForMdl, "vendor_id", "vendor_nk", "vendor_sk")
    wh.dimVendor.overwrite(upsertedDim)

    // usp_upsert_fact_trip_streaming: resolve SKs (broadcast dim,
    // COALESCE -1 unknown) + the same partition-scoped merge on trip_id
    val factStaged = sliceForMdl
      .join(broadcast(wh.dimVendor.read),
        sliceForMdl("vendor_id") === col("vendor_nk"), "left")
      .select(col("trip_id"),
        coalesce(col("vendor_sk"), lit(-1)).as("vendor_sk"),
        col("fare_amount"), col("tip_amount"), col("total_amount"),
        col("_runId"),
        (year(col("pickup_ts")) * 10000 + month(col("pickup_ts")) * 100 +
          dayofmonth(col("pickup_ts"))).cast("int").as("pickup_date_key"))
    scopedMerge(wh.fact, factStaged, "pickup_date_key")

    // usp_purge_trip_clean_slice_streaming: post-success purge
    wh.slice.deleteWhere(col("_runId") === runId)

    val res = HourResult(files, rowsCopied, inserted, updated, inserted + updated)
    import spark.implicits._
    wh.audit.append(Seq((runId, date, hour, files, rowsCopied, inserted, updated,
      res.total)).toDF(auditSchema.fieldNames.toSeq: _*))
    // per-blob audit rows (stg.usp_log_ingest: one 'Succeeded' row per file)
    wh.fileAudit.append(perBlob.toSeq
      .map { case (blob, rows) => (runId, date, hour, blob, rows, "Succeeded") }
      .toDF(fileAuditSchema.fieldNames.toSeq: _*))
    res
  }

  /** Retention purge of the staging table (usp_purge_trip_clean_slice
    * semantics applied to stg): metadata-only drop of whole `p_date=`
    * partition dirs older than `today - keepDays`. The same call works on
    * any date-partitioned table of the warehouse (e.g. `core` by
    * pickup_date for business-retention policies). */
  def purgeStg(wh: Warehouse, keepDays: Int,
               today: java.time.LocalDate): graft.batch.Maintenance.PurgeResult =
    graft.batch.Maintenance.retentionPurge(wh.stg, keepDays, today)

  /** Backfill loop over an inclusive hour range within one date
    * (pl_streaming_backfill_range Until1). */
  def runRange(wh: Warehouse, curatedDir: String, date: String,
               fromHour: Int, toHour: Int): Seq[HourResult] =
    (fromHour to toHour).map { h =>
      val hh = f"$h%02d"
      runHour(wh, curatedDir, date, hh, runId = s"$date-$hh")
    }
}
