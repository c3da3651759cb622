package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ops.ParquetTable

/** Lake → warehouse hourly micro-batch (SURVEY.md §3.3; ref
  * pl_streaming_curated_to_stg_core_mdl.json + the five streaming procs).
  *
  * Per completed hour: check the folder exists (skip if absent) → per-file
  * idempotent staging load (DELETE by `_blobPath` then append, ref
  * 0005_delete.sql) → run-scoped slice rebuild with the deterministic
  * hash64 trip id + winner-pick dedupe → update-then-insert merge into
  * `core_trip_clean` keyed on trip_id, returning (inserted, updated,
  * total) (the documented contract of usp_upsert_fact_trip_streaming) →
  * slice purge → audit row.
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

  val curatedReadSchema: StructType = StructType.fromDDL(
    "c_event_id STRING, c_vendor_id STRING, c_pickup STRING, c_dropoff STRING, " +
      "c_passengers STRING, c_distance STRING, c_fare STRING, c_tip STRING, " +
      "c_total STRING, c_payment STRING, c_producer STRING")

  val stgSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, vendor_id STRING, pickup_ts TIMESTAMP_NTZ, " +
      "dropoff_ts TIMESTAMP_NTZ, passenger_count BIGINT, trip_distance DOUBLE, " +
      "fare_amount DOUBLE, tip_amount DOUBLE, total_amount DOUBLE, " +
      "payment_type STRING, producer_ts TIMESTAMP_NTZ, " +
      "_runId STRING, _blobPath STRING, _ingestedAt TIMESTAMP_NTZ")

  val coreSchema: StructType = StructType.fromDDL(
    "trip_id BIGINT, event_id BIGINT, vendor_id STRING, " +
      "pickup_ts TIMESTAMP_NTZ, dropoff_ts TIMESTAMP_NTZ, passenger_count BIGINT, " +
      "trip_distance DOUBLE, fare_amount DOUBLE, tip_amount DOUBLE, " +
      "total_amount DOUBLE, payment_type STRING, producer_ts TIMESTAMP_NTZ, " +
      "_runId STRING, _blobPath STRING, _ingestedAt TIMESTAMP_NTZ")

  val dimVendorSchema: StructType = StructType.fromDDL(
    "vendor_nk STRING, vendor_sk INT")

  val factSchema: StructType = StructType.fromDDL(
    "trip_id BIGINT, vendor_sk INT, pickup_date_key INT, fare_amount DOUBLE, " +
      "tip_amount DOUBLE, total_amount DOUBLE, _runId STRING")

  val auditSchema: StructType = StructType.fromDDL(
    "run_id STRING, p_date STRING, p_hour STRING, files BIGINT, " +
      "rows_copied BIGINT, inserted BIGINT, updated BIGINT, total BIGINT")

  final case class Warehouse(spark: SparkSession, dir: String) {
    val stg: ParquetTable = ParquetTable(spark, s"$dir/stg_trips_streaming", stgSchema)
    val slice: ParquetTable = ParquetTable(spark, s"$dir/core_trip_clean_slice", coreSchema)
    val core: ParquetTable = ParquetTable(spark, s"$dir/core_trip_clean", coreSchema)
    val dimVendor: ParquetTable = ParquetTable(spark, s"$dir/dim_vendor", dimVendorSchema)
    val fact: ParquetTable = ParquetTable(spark, s"$dir/fact_trip", factSchema)
    val audit: ParquetTable = ParquetTable(spark, s"$dir/ingest_audit", auditSchema)
  }

  final case class HourResult(files: Long, rowsCopied: Long, inserted: Long,
                              updated: Long, total: Long)

  /** Load one completed hour. Returns the merge counts; zero result (and
    * no writes) if the hour folder is absent. */
  def runHour(wh: Warehouse, curatedDir: String, date: String, hour: String,
              runId: String): HourResult = {
    val spark = wh.spark
    val hourPath = s"$curatedDir/p_date=$date/p_hour=$hour"
    val fs = new Path(hourPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(hourPath))) return HourResult(0, 0, 0, 0, 0) // skip absent hour

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
      current_timestamp().cast("timestamp_ntz").as("_ingestedAt"))
    val blobs = typed.select("_blobPath").distinct().collect().map(_.getString(0))
    val files = blobs.length.toLong
    wh.stg.deleteWhere(col("_blobPath").isin(blobs.toSeq: _*))
    wh.stg.append(typed)
    val rowsCopied = typed.count()

    // usp_build_trip_clean_slice_streaming: run-scoped slice, hash id, dedupe
    val staged = wh.stg.read.filter(col("_runId") === runId)
      .withColumn("trip_id", StreamTransforms.streamTripId)
    val w = Window.partitionBy(col("trip_id"))
      .orderBy(col("producer_ts").desc, col("_ingestedAt").desc, col("_blobPath").desc)
    val sliceDf = staged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    wh.slice.deleteWhere(col("_runId") === runId)
    wh.slice.append(sliceDf)

    // usp_upsert_trip_clean_from_slice_streaming: update-then-insert merge
    val target = wh.core.read
    val stagedSlice = wh.slice.read.filter(col("_runId") === runId)
    val joined = stagedSlice.as("s")
      .join(target.as("t"), Seq("trip_id"), "full_outer")
    val merged = joined.select(col("trip_id") +:
      coreSchema.fieldNames.filterNot(_ == "trip_id").map(c =>
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)).toSeq: _*)
    val actions = joined.select(
      when(col("s.event_id").isNotNull && col("t.event_id").isNotNull, "updated")
        .when(col("s.event_id").isNotNull, "inserted").otherwise("unchanged").as("a"))
      .groupBy("a").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    wh.core.overwrite(merged)
    val inserted = actions.getOrElse("inserted", 0L)
    val updated = actions.getOrElse("updated", 0L)

    // usp_upsert_dims_from_slice_streaming: anti-join append of novel NKs
    // (SKs continue after max; existing SKs never move)
    // read from the slice table (not the merged-core plan — its source dir
    // was just replaced by the overwrite above)
    val sliceForMdl = wh.slice.read.filter(col("_runId") === runId)
    val upsertedDim = graft.batch.StarModel.upsertDim(
      wh.dimVendor.read, sliceForMdl, "vendor_id", "vendor_nk", "vendor_sk")
    wh.dimVendor.overwrite(upsertedDim)

    // usp_upsert_fact_trip_streaming: resolve SKs (broadcast dim,
    // COALESCE -1 unknown) + update-then-insert merge on trip_id
    val factStaged = sliceForMdl
      .join(broadcast(wh.dimVendor.read),
        sliceForMdl("vendor_id") === col("vendor_nk"), "left")
      .select(col("trip_id"),
        coalesce(col("vendor_sk"), lit(-1)).as("vendor_sk"),
        (year(col("pickup_ts")) * 10000 + month(col("pickup_ts")) * 100 +
          dayofmonth(col("pickup_ts"))).cast("int").as("pickup_date_key"),
        col("fare_amount"), col("tip_amount"), col("total_amount"),
        col("_runId"))
    val factJoined = factStaged.as("s")
      .join(wh.fact.read.as("t"), Seq("trip_id"), "full_outer")
    val factMerged = factJoined.select(col("trip_id") +:
      factSchema.fieldNames.filterNot(_ == "trip_id").map(c =>
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)).toSeq: _*)
    wh.fact.overwrite(factMerged)

    // usp_purge_trip_clean_slice_streaming: post-success purge
    wh.slice.deleteWhere(col("_runId") === runId)

    val res = HourResult(files, rowsCopied, inserted, updated, inserted + updated)
    import spark.implicits._
    wh.audit.append(Seq((runId, date, hour, files, rowsCopied, inserted, updated,
      res.total)).toDF(auditSchema.fieldNames.toSeq: _*))
    res
  }

  /** Backfill loop over an inclusive hour range within one date
    * (pl_streaming_backfill_range Until1). */
  def runRange(wh: Warehouse, curatedDir: String, date: String,
               fromHour: Int, toHour: Int): Seq[HourResult] =
    (fromHour to toHour).map { h =>
      val hh = f"$h%02d"
      runHour(wh, curatedDir, date, hh, runId = s"$date-$hh")
    }
}
