package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QFn
import graft.batch.StarModel
import graft.functions.TaxiFunctions._
import graft.model.TaxiModel
import graft.oracle.OracleCte.{taxi, taxiWith}

/** Batch-lane operator queries (SURVEY.md §2.2-§2.7) over the taxi-shaped
  * view of the fixtures, each with a DuckDB oracle.
  *
  * Every query ends in a total ORDER BY on non-null keys so the driver's
  * row-order hash compare is deterministic. Double-valued aggregates are
  * summed as DECIMAL (exact, order-independent) and cast to DOUBLE at the
  * end, so Spark's partition-order-dependent float summation can never
  * diverge from DuckDB's sequential one.
  */
object TaxiQueries {

  private def trips(s: SparkSession, d: String) = TaxiModel.trips(s, d)
  private def cleanedDf(s: SparkSession, d: String) = Memo(s"$d/cleaned") {
    // One deterministic hash repartition before the clean projection —
    // the same single-row-group-fixture fix as EventsModel.rawEvents: the
    // fixture parquet is one row group, so without it the entire
    // clean+write (and the dedupe's map-side partial agg reading the
    // 1-file memo back) runs as ONE task regardless of core count. The
    // production chain reads many landing files and parallelizes at the
    // source; partition count follows spark.sql.shuffle.partitions.
    val parts = s.sessionState.conf.numShufflePartitions
    TaxiModel.cleaned(
      TaxiModel.tripsWithDups(s, d).repartition(parts, col("trip_src_id")),
      TaxiModel.paymentTypeMap(s))
  }
  private def dedupedDf(s: SparkSession, d: String) = Memo(s"$d/deduped") {
    TaxiModel.deduped(cleanedDf(s, d))
  }

  /** Calendar dim, memoized — three consumers (dim_date_attrs,
    * join_calendar, agg_rollup_calendar) previously re-ran the min/max
    * span aggregate over the deduped core per invocation; the dim is a
    * once-per-run table in the reference (mdl.dim_date). */
  private def dimDateDf(s: SparkSession, d: String) = Memo.of(s, s"$d/dim_date") {
    StarModel.dimDate(dedupedDf(s, d))
  }

  // Memo.of, NOT Memo.apply: the star build is EAGER (each dim census
  // collect()s its domain to number SKs — 5 driver jobs). Memo.apply
  // re-evaluates the builder on every call just to learn the session, so
  // every fact-consuming query re-ran the 5 dim jobs per invocation even
  // on a memo hit (~0.8-1.3 s/call at sf0.1 local[8], measured round 19).
  // Memo.of skips the builder entirely on a hit — the dims build exactly
  // once per session, like the reference's once-per-run mdl.dim_* tables.
  private[queries] def factDf(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Memo.of(s, s"$d/fact") { StarModel.factFromDeduped(dedupedDf(s, d)) }

  /** Materialize the shared memo chain (cleaned → deduped → fact) so
    * per-query bench timings are steady-state. The reference's analog:
    * core.trip_clean / mdl.fact_trip are tables written once per run, not
    * rebuilt inside every downstream statement — without this the first
    * query to touch the chain absorbs its whole build cost. */
  def warm(s: SparkSession, d: String): Unit = {
    factDf(s, d).count(): Unit // fact's plan pulls deduped + cleaned caches
  }

  /** Exact, order-independent sum of a double column: per-row round to
    * DECIMAL(18,6) (deterministic on the exact binary value), exact decimal
    * summation, final cast back to DOUBLE. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,6)")).cast("double")
  private def dsumSql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE)"

  val queries: Map[String, QFn] = Map(
    // ---- §2.2 projections / filters ----
    "clean_typing" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"),
        when(col("trip_src_id") % 17 === 0, lit("N/A"))
          .otherwise(col("trip_src_id").cast("string")).as("id_str"),
        when(col("trip_src_id") % 2 === 0, lit("1997-05-30"))
          .otherwise(lit("not-a-date")).as("date_str"),
        decimalRender(col("fare_amount"), 6).as("fare_str"))
      .select(col("trip_src_id"),
        expr("try_cast(id_str AS BIGINT)").as("id_typed"),
        expr("try_cast(fare_str AS DOUBLE)").as("fare_typed"),
        expr("try_cast(date_str AS DATE)").cast("string").as("date_typed"))
      .orderBy("trip_src_id", "fare_typed")),

    "clean_trim_null" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"), cleanTrimNull(col("vendor_raw")).as("vendor_code"))
      .orderBy("trip_src_id", "vendor_code")),

    "filter_domain" -> ((s, d) => trips(s, d)
      .filter(TaxiModel.domainFilter)
      .select("trip_src_id", "pickup_ts", "dropoff_ts", "fare_amount", "trip_distance_mi")
      .orderBy("trip_src_id", "fare_amount", "trip_distance_mi")),

    "route_rejects" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNull || col("dropoff_ts").isNull ||
        col("pickup_ts") > col("dropoff_ts") ||
        col("fare_amount") < 0 || col("trip_distance_mi") < 0)
      .select(col("trip_src_id"), TaxiModel.rejectReason.as("reject_reason"))
      .orderBy("trip_src_id", "reject_reason")),

    "filter_slice" -> ((s, d) => trips(s, d)
      .filter(col("ingest_date").between("1997-01-01", "1997-12-31"))
      .select(col("trip_src_id"), col("ingest_date").cast("string").as("ingest_date"),
        col("fare_amount"))
      .orderBy("trip_src_id", "fare_amount")),

    // ---- §2.3 scalar functions ----
    "f_unit_convert" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"), milesToKm(col("trip_distance_mi")).as("trip_distance_km"))
      .orderBy("trip_src_id", "trip_distance_km")),

    "f_payment_canon" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"), paymentCanonCase(trim(col("payment_src"))).as("payment_std"))
      .orderBy("trip_src_id", "payment_std")),

    // All per-row projections below order by EVERY output column, not just
    // trip_src_id: the fixture's lineitem carries duplicate
    // (l_orderkey, l_linenumber) pairs, so trip_src_id alone is not a
    // total order and engines may break the ties differently (measured at
    // x20: adjacent-row swaps on ~20% of rows). With the full column list
    // any remaining tie is a fully identical row — swap-invariant under
    // the row-order hash at ANY corpus size.
    "f_night_flag" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNotNull)
      .select(col("trip_src_id"), hour(col("pickup_ts")).cast("int").as("pickup_hour"),
        nightFlag(col("pickup_ts")).as("is_night_ride"))
      .orderBy("trip_src_id", "pickup_hour", "is_night_ride")),

    "f_date_key" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNotNull)
      .select(col("trip_src_id"), dateKey(col("pickup_ts")).as("pickup_date_key"))
      .orderBy("trip_src_id", "pickup_date_key")),

    "f_time_key" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNotNull)
      .select(col("trip_src_id"), timeKey(col("pickup_ts")).as("pickup_time_key"))
      .orderBy("trip_src_id", "pickup_time_key")),

    "f_duration_min" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNotNull && col("dropoff_ts").isNotNull)
      .select(col("trip_src_id"),
        durationMin(col("pickup_ts"), col("dropoff_ts")).as("duration_min"))
      .orderBy("trip_src_id", "duration_min")),

    "f_sha256_hex" -> ((s, d) => cleanedDf(s, d)
      .select(col("trip_src_id"), col("source_file_name"), TaxiModel.tripId.as("trip_id"))
      .orderBy("trip_src_id", "source_file_name", "trip_id")),

    "f_hash64_id" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNotNull && col("dropoff_ts").isNotNull)
      .select(col("trip_src_id"),
        hash64Id(concat_ws("|", lit("e"), col("trip_src_id").cast("string"),
          isoFormat(col("pickup_ts")), isoFormat(col("dropoff_ts")))).as("stream_trip_id"))
      .orderBy("trip_src_id", "stream_trip_id")),

    "f_basename" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"),
        basename(concat(lit("lake/date=2024/06/01/"), col("source_file_name")))
          .as("file_name"))
      .orderBy("trip_src_id", "file_name")),

    "f_truncate" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"), truncateTo(col("source_file_name"), 6).as("file_prefix"),
        truncateTo(col("payment_src"), 2).as("payment16"))
      .orderBy("trip_src_id", "file_prefix", "payment16")),

    "f_iso_format" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNotNull)
      .select(col("trip_src_id"), isoFormat(col("pickup_ts")).as("pickup_iso"))
      .orderBy("trip_src_id", "pickup_iso")),

    "f_concat_payload" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"),
        concatPayload(
          "vendor" -> col("vendor_raw"),
          "fare" -> decimalRender(col("fare_amount"), 6),
          "rate" -> col("rate_code"),
          "pickup" -> isoFormat(col("pickup_ts"))).as("raw_payload"))
      .orderBy("trip_src_id", "raw_payload")),

    "f_json_build" -> ((s, d) => {
      val rejects = trips(s, d).filter(col("pickup_ts").isNull ||
        col("dropoff_ts").isNull || col("pickup_ts") > col("dropoff_ts") ||
        col("fare_amount") < 0 || col("trip_distance_mi") < 0)
      val counts = rejects.agg(
        count(lit(1)).as("bad_rows"),
        sum(when(col("fare_amount") < 0, 1).otherwise(0)).cast("long").as("negative_fare"))
      counts.select(to_json(struct(col("bad_rows"), col("negative_fare"))).as("audit_json"))
    }),

    "f_to_date" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"),
        to_date(coalesce(col("pickup_ts"), lit("2024-01-01 00:00:00").cast("timestamp_ntz")))
          .cast("string").as("ingest_date_derived"))
      .orderBy("trip_src_id", "ingest_date_derived")),

    "f_safe_divide" -> ((s, d) => trips(s, d)
      .select(col("trip_src_id"),
        safeDivide(col("tip_amount"), col("fare_amount")).as("tip_pct"),
        safeDivide(col("fare_amount"), col("trip_distance_mi")).as("fare_per_mile"))
      .orderBy("trip_src_id", "tip_pct", "fare_per_mile")),

    // ---- §2.4 joins ----
    "join_ref_lookup" -> ((s, d) => {
      val pm = TaxiModel.paymentTypeMap(s).filter(col("is_active"))
        .select("payment_type_src", "payment_type_std")
      trips(s, d)
        .join(broadcast(pm), trim(col("payment_src")) === col("payment_type_src"), "left")
        .select(col("trip_src_id"),
          coalesce(col("payment_type_std"), lit("UNKNOWN")).as("payment_type"))
        .orderBy("trip_src_id", "payment_type")
    }),

    "upsert_dim_antijoin" -> ((s, d) => {
      val ded = dedupedDf(s, d)
      val existing = StarModel.dimLocation(ded.filter(col("ingest_date") < "1996-01-01"))
      val upserted = StarModel.upsertDim(
        existing.select(col("loc_nk"), col("loc_sk")), ded, "pu_location_id", "loc_nk", "loc_sk")
      upserted.orderBy("loc_sk")
    }),

    "join_fact_dims" -> ((s, d) => factDf(s, d)
      .select("trip_id", "pickup_date_key", "pickup_time_key", "vendor_sk",
        "payment_sk", "rate_sk", "flag_sk", "pu_location_sk", "do_location_sk",
        "fare_amount", "is_night_ride")
      .orderBy("trip_id", "pickup_date_key")),

    "join_core_stg_correlate" -> ((s, d) => {
      val core = dedupedDf(s, d).select("trip_src_id", "pickup_ts_utc",
        "dropoff_ts_utc", "ingest_date", "source_file_name")
      val stg = TaxiModel.tripsWithDups(s, d).select(
        col("ingest_date").as("s_ingest_date"),
        col("source_file_name").as("s_source_file_name"),
        col("pickup_ts").as("s_pickup_ts"), col("dropoff_ts").as("s_dropoff_ts"),
        col("tolls_amount"), col("total_amount"), col("loaded_at"),
        col("trip_src_id").as("s_trip_src_id"))
      val joined = core.join(stg,
        core("ingest_date") === stg("s_ingest_date") &&
          core("source_file_name") === stg("s_source_file_name") &&
          core("pickup_ts_utc") === stg("s_pickup_ts") &&
          core("dropoff_ts_utc") === stg("s_dropoff_ts"), "left")
      // Measured, kept AS the window shape (optimization round 19): the
      // max(struct(...)) hash-agg rewrite (as in TaxiModel.deduped) was
      // tried and REVERTED — a struct aggregation buffer is not
      // mutable-buffer-typed, so both partial and final aggregates planned
      // as SortAggregate (sort both sides, 2.4 s -> 4.1 s at sf0.1
      // local[8]), strictly worse than this window path, which already
      // prunes to rank 1 BEFORE the exchange via the partial
      // WindowGroupLimit (rn=1 pushdown) on Spark 4.
      // NOTE (optimization round 20, measured and REVERTED): widening the
      // window partition to (4 join keys, trip_src_id) — so the window
      // could reuse the SortMergeJoin's HashPartitioning and skip the
      // trip_src_id reshuffle (subset rule) — read 2.27 s -> 1.96 s but
      // CHANGED THE RESULT (oracle rowcount 30895 -> 37891 at sf0.01):
      // trip_src_id is NOT unique in the deduped core (the fixture's
      // lineitem carries duplicate (l_orderkey, l_linenumber) pairs, so up
      // to 5 core rows share an id across natural-key groups), and those
      // rows differ in the join keys, splitting the winner groups. The
      // trip_src_id-only window genuinely needs its own exchange.
      val w = Window.partitionBy(col("trip_src_id"))
        .orderBy(col("loaded_at").desc, col("s_source_file_name").desc,
          col("s_trip_src_id").desc, col("tolls_amount").desc,
          col("total_amount").desc)
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("trip_src_id"), col("tolls_amount"), col("total_amount"))
        .orderBy("trip_src_id", "tolls_amount", "total_amount")
    }),

    "merge_upsert_key" -> ((s, d) => {
      // Synapse-safe upsert (update-then-insert as full-outer rebuild):
      // target = pre-1997 slice, staged = 1996-06..1997-12 slice (overlap).
      val f = factDf(s, d)
        .select("trip_id", "fare_amount", "total_amount", "ingest_date")
      val target = f.filter(col("ingest_date") < "1997-01-01")
      val staged = f.filter(col("ingest_date").between("1996-06-01", "1997-12-31"))
        .withColumn("total_amount", col("total_amount") + 1.0)
      // Existence from explicit per-side markers, matched rows take ALL
      // source columns (reference UPDATE-all-columns semantics, ref
      // usp_upsert_trip_clean_from_slice_streaming.sql:37-44).
      val sEx = col("_s_exists").isNotNull
      val tEx = col("_t_exists").isNotNull
      val merged = staged.withColumn("_s_exists", lit(true)).as("s")
        .join(target.withColumn("_t_exists", lit(true)).as("t"),
          Seq("trip_id"), "full_outer")
        .select(col("trip_id"),
          when(sEx, col("s.fare_amount")).otherwise(col("t.fare_amount")).as("fare_amount"),
          when(sEx, col("s.total_amount")).otherwise(col("t.total_amount")).as("total_amount"),
          when(sEx && tEx, "updated").when(sEx, "inserted")
            .otherwise("unchanged").as("merge_action"))
      merged.orderBy("trip_id")
    }),

    "join_star_view" -> ((s, d) => {
      val ded = dedupedDf(s, d)
      val f = factDf(s, d)
      // memoized: StarModel.dim is eager (driver SK numbering collect);
      // without the memo every rep re-ran both dim census jobs
      val dv = Memo.of(s, s"$d/dim_vendor") {
        StarModel.dim(ded, "vendor_code", "vendor_nk", "vendor_sk")
      }
      val dp = Memo.of(s, s"$d/dim_payment") {
        StarModel.dim(ded, "payment_type", "payment_nk", "payment_sk")
      }
      f.join(broadcast(dv), Seq("vendor_sk"), "left")
        .join(broadcast(dp), Seq("payment_sk"), "left")
        .select(col("trip_id"), col("vendor_nk"), col("payment_nk"),
          col("fare_amount"), col("trip_distance_km"),
          safeDivide(col("tip_amount"), col("fare_amount")).as("tip_pct"),
          safeDivide(col("fare_amount"), col("trip_distance_km")).as("fare_per_km"))
        .orderBy("trip_id")
    }),

    // Calendar dims (ref: mdl/dim_date.table.sql:5-15, dim_time.table
    // .sql:5-10): reference ships DDL only, semantics pinned in
    // StarModel.dimDate/dimTime scaladoc.
    "dim_date_attrs" -> ((s, d) => dimDateDf(s, d)
      .select(col("date_key"), col("date_value").cast("string").as("date_value"),
        col("year"), col("quarter"), col("month"), col("day"),
        col("week_of_year"), col("iso_year"), col("iso_week"),
        col("is_weekend"), col("is_holiday"))
      .orderBy("date_key")),

    "dim_time_attrs" -> ((s, d) => StarModel.dimTime(s).orderBy("time_key")),

    // The bread-and-butter BI slice the calendar dims exist for
    // (ref: vw_fact_trip_bi.view.sql:46-47 — dim_date is the view's FIRST
    // join): trips and fare by year × weekend × night. Both dims broadcast
    // (REPLICATE analog); the fact never shuffles pre-aggregation.
    "join_calendar" -> ((s, d) => {
      val f = factDf(s, d)
      val dd = dimDateDf(s, d)
      val dt = StarModel.dimTime(s)
      f.join(broadcast(dd), f("pickup_date_key") === dd("date_key"))
        .join(broadcast(dt), f("pickup_time_key") === dt("time_key"), "left")
        .groupBy(col("year"), col("is_weekend"), col("is_night"))
        .agg(count(lit(1)).as("trips"), dsum("fare_amount").as("total_fare"))
        .orderBy("year", "is_weekend", "is_night")
    }),

    // As-of join (time-series primitive; DuckDB oracle uses its native
    // ASOF LEFT JOIN): each trip picks the vendor's latest daily rate
    // whose version timestamp is <= the pickup time.
    "join_asof" -> ((s, d) => {
      val ded = dedupedDf(s, d).filter(col("vendor_code").isNotNull)
      val rates = ded.groupBy(col("vendor_code"), col("ingest_date"))
        .agg((dsum("fare_amount") / count(lit(1))).as("day_rate"))
        .select(col("vendor_code"),
          col("ingest_date").cast("timestamp_ntz").as("rate_ts"), col("day_rate"))
      val left = ded.select(col("trip_src_id"), col("vendor_code"), col("pickup_ts_utc"))
      graft.ops.AsofJoin.backward(left, rates, Seq("vendor_code"),
          "pickup_ts_utc", "rate_ts", Seq("day_rate"))
        .select(col("trip_src_id"), col("vendor_code"), col("day_rate"))
        .orderBy("trip_src_id", "vendor_code", "day_rate")
    }),

    // Tolerance-bounded as-of (pandas merge_asof tolerance): the latest
    // daily rate counts only within the last 2 days of the pickup — a
    // staler match is discarded and the trip keeps NULL rate (row count
    // preserved). Day-granularity numeric timestamps; the oracle mirrors
    // with native ASOF + an explicit gap guard.
    "join_asof_tolerance" -> ((s, d) => {
      val ded = dedupedDf(s, d).filter(col("vendor_code").isNotNull)
      val rates = ded.groupBy(col("vendor_code"), col("ingest_date"))
        .agg((dsum("fare_amount") / count(lit(1))).as("day_rate"))
        .select(col("vendor_code"),
          datediff(col("ingest_date"), lit("1970-01-01").cast("date"))
            .as("rate_day"), col("day_rate"))
      val left = ded.select(col("trip_src_id"), col("vendor_code"),
        datediff(to_date(col("pickup_ts_utc")), lit("1970-01-01").cast("date"))
          .as("pickup_day"))
      graft.ops.AsofJoin.backwardTolerance(left, rates, Seq("vendor_code"),
          "pickup_day", "rate_day", Seq("day_rate"), tolerance = 2L)
        .select(col("trip_src_id"), col("vendor_code"), col("day_rate"))
        .orderBy("trip_src_id", "vendor_code", "day_rate")
    }),

    // Forward as-of: each trip picks the vendor's NEXT daily rate at or
    // after pickup — the settlement-lookup direction (mirror of join_asof).
    "join_asof_fwd" -> ((s, d) => {
      val ded = dedupedDf(s, d).filter(col("vendor_code").isNotNull)
      val rates = ded.groupBy(col("vendor_code"), col("ingest_date"))
        .agg((dsum("fare_amount") / count(lit(1))).as("day_rate"))
        .select(col("vendor_code"),
          col("ingest_date").cast("timestamp_ntz").as("rate_ts"), col("day_rate"))
      val left = ded.select(col("trip_src_id"), col("vendor_code"), col("pickup_ts_utc"))
      graft.ops.AsofJoin.forward(left, rates, Seq("vendor_code"),
          "pickup_ts_utc", "rate_ts", Seq("day_rate"))
        .select(col("trip_src_id"), col("vendor_code"), col("day_rate"))
        .orderBy("trip_src_id", "vendor_code", "day_rate")
    }),

    // Range join (point-in-interval, bin-bucketized — no cross product):
    // trips against overlapping time-of-day bands (48 half-hours + two
    // broad rush bands, so points genuinely match multiple intervals).
    "join_range" -> ((s, d) => {
      import s.implicits._
      val bands = ((0 until 48).map(i =>
        (f"hh${i / 2}%02d_${30 * (i % 2)}%02d", i * 1800L, i * 1800L + 1799L)) ++
        Seq(("morning", 6 * 3600L, 12 * 3600L - 1), ("evening", 16 * 3600L, 22 * 3600L - 1)))
        .toDF("band", "lo", "hi")
      val pts = dedupedDf(s, d).select(col("trip_src_id"), col("fare_amount"),
        timeKey(col("pickup_ts_utc")).as("tk"))
      graft.ops.RangeJoin.pointInInterval(pts, bands, "tk", "lo", "hi", 1800L)
        .groupBy("band")
        .agg(count(lit(1)).as("trips"), dsum("fare_amount").as("total_fare"))
        .orderBy("band")
    }),

    // ---- §2.5 aggregations ----
    "agg_counts_by_slice" -> ((s, d) => dedupedDf(s, d)
      .groupBy(col("ingest_date").cast("string").as("ingest_date"))
      .agg(count(lit(1)).as("rows_out"))
      .orderBy("ingest_date")),

    "agg_sum_reconcile" -> ((s, d) => {
      val core = dedupedDf(s, d).agg(dsum("fare_amount").as("core_fare"))
      val fct = factDf(s, d).agg(dsum("fare_amount").as("fact_fare"))
      core.crossJoin(fct).select(col("core_fare"), col("fact_fare"),
        (col("core_fare") === col("fact_fare")).as("fare_matches"))
    }),

    "agg_dupe_check" -> ((s, d) => {
      val grouped = cleanedDf(s, d)
        .groupBy(TaxiModel.naturalKey.map(col): _*)
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
      grouped.agg(count(lit(1)).as("dup_groups"),
        coalesce(sum(col("cnt")), lit(0L)).cast("long").as("dup_rows"))
    }),

    "agg_distinct_nk" -> ((s, d) => dedupedDf(s, d)
      .filter(col("vendor_code").isNotNull)
      .select("vendor_code").distinct().orderBy("vendor_code")),

    "agg_reason_pivot" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNull || col("dropoff_ts").isNull ||
        col("pickup_ts") > col("dropoff_ts") ||
        col("fare_amount") < 0 || col("trip_distance_mi") < 0)
      .select(TaxiModel.rejectReason.as("reject_reason"))
      .agg(
        sum(when(col("reject_reason") === "NULL_TIME", 1).otherwise(0))
          .cast("long").as("null_time"),
        sum(when(col("reject_reason") === "NEGATIVE_FARE", 1).otherwise(0))
          .cast("long").as("negative_fare"),
        sum(when(col("reject_reason") === "NEGATIVE_DISTANCE", 1).otherwise(0))
          .cast("long").as("negative_distance"),
        sum(when(col("reject_reason") === "PICKUP_AFTER_DROPOFF", 1).otherwise(0))
          .cast("long").as("pickup_after_dropoff"))),

    "agg_reject_breakdown" -> ((s, d) => trips(s, d)
      .filter(col("pickup_ts").isNull || col("dropoff_ts").isNull ||
        col("pickup_ts") > col("dropoff_ts") ||
        col("fare_amount") < 0 || col("trip_distance_mi") < 0)
      .groupBy(TaxiModel.rejectReason.as("reject_reason"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("reject_reason"))),

    "agg_bi_measures" -> ((s, d) => factDf(s, d)
      .groupBy(col("vendor_sk"))
      .agg(
        count(lit(1)).as("trips"),
        dsum("fare_amount").as("total_fare"),
        (dsum("tip_amount") / nullif(dsum("fare_amount"), lit(0.0))).as("tip_pct"),
        (dsum("fare_amount") / count(lit(1))).as("avg_fare_per_trip"),
        (dsum("fare_amount") / nullif(dsum("trip_distance_km"), lit(0.0))).as("avg_fare_per_km"))
      .orderBy("vendor_sk")),

    // BI subtotal lattice over the calendar: ROLLUP(year, quarter) gives
    // per-quarter, per-year, and grand-total rows in one pass (partial
    // aggregation handles all grouping sets in a single shuffle).
    "agg_rollup_calendar" -> ((s, d) => {
      val f = factDf(s, d)
      val dd = dimDateDf(s, d)
      f.join(broadcast(dd), f("pickup_date_key") === dd("date_key"))
        .rollup(col("year"), col("quarter"))
        .agg(count(lit(1)).as("trips"), dsum("fare_amount").as("total_fare"),
          grouping(col("year")).cast("int").as("g_year"),
          grouping(col("quarter")).cast("int").as("g_quarter"))
        .select("year", "quarter", "trips", "total_fare", "g_year", "g_quarter")
        .orderBy(col("g_year"), col("g_quarter"), col("year"), col("quarter"))
    }),

    // Full CUBE lattice over vendor × rate (all four grouping sets in one
    // shuffle), completing the grouping-sets family next to ROLLUP.
    // Vendor NULLs are filtered so data NULLs never collide with
    // cube-generated subtotal NULLs in the sort.
    "agg_cube" -> ((s, d) => dedupedDf(s, d)
      .filter(col("vendor_code").isNotNull)
      .cube(col("vendor_code"), col("rate_code"))
      .agg(count(lit(1)).as("trips"), dsum("fare_amount").as("total_fare"),
        grouping(col("vendor_code")).cast("int").as("g_vendor"),
        grouping(col("rate_code")).cast("int").as("g_rate"))
      .orderBy(col("g_vendor"), col("g_rate"), col("vendor_code"), col("rate_code"))),

    // Explicit GROUPING SETS (the lattice family's third member next to
    // ROLLUP/CUBE): exactly the (vendor), (rate), () subtotal rows — a
    // BI report that wants two independent breakdowns WITHOUT the
    // (vendor, rate) cross detail pays one shuffle for all three sets.
    "agg_grouping_sets" -> ((s, d) => dedupedDf(s, d)
      .filter(col("vendor_code").isNotNull)
      .groupingSets(
        Seq(Seq(col("vendor_code")), Seq(col("rate_code")), Seq()),
        col("vendor_code"), col("rate_code"))
      .agg(count(lit(1)).as("trips"), dsum("fare_amount").as("total_fare"),
        grouping(col("vendor_code")).cast("int").as("g_vendor"),
        grouping(col("rate_code")).cast("int").as("g_rate"))
      .orderBy(col("g_vendor"), col("g_rate"), col("vendor_code"), col("rate_code"))),

    // Distribution windows: per-vendor fare quartile (ntile) + exact
    // cumulative distribution — the percentile-bucket assignment BI uses
    // for "which quartile is this trip in". One shuffle on vendor_code;
    // ties broken by trip_src_id so both engines rank identically.
    "win_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("vendor_code"))
        .orderBy(col("fare_amount"), col("trip_src_id"))
      dedupedDf(s, d)
        .filter(col("vendor_code").isNotNull && col("fare_amount").isNotNull)
        .select(col("trip_src_id"), col("vendor_code"), col("fare_amount"),
          ntile(4).over(w).cast("int").as("fare_quartile"),
          cume_dist().over(w).as("cume"))
        // trip_src_id alone is not total here (deduped keeps replays that
        // differ on the compound key) — add fare for a total output order
        .orderBy("vendor_code", "trip_src_id", "fare_amount")
    }),

    // A principal's secured view of the trip table: deny-by-default
    // policy layer (graft.security.AccessPolicy) — trip id masked by
    // deterministic sha256 (equal ids mask equally → joins/distinct
    // still work), payment column dropped, row-level filter applied.
    // Pure projection+predicate: fuses into the scan's codegen, no
    // shuffle, pushdown intact. Every output column joins the ORDER BY,
    // so full-row duplicates stay interchangeable under the sort.
    "secure_view_mask" -> ((s, d) => {
      val pol = graft.security.TablePolicy(
        maskCols = Seq("trip_src_id"),
        dropCols = Seq("payment_type"),
        rowFilter = Some(col("vendor_code").isNotNull &&
          col("fare_amount") > 0 && col("trip_distance_km").isNotNull))
      graft.security.AccessPolicy.secure(dedupedDf(s, d), pol)
        .select(col("trip_src_id").as("masked_id"), col("vendor_code"),
          col("fare_amount"), col("trip_distance_km"))
        .orderBy("masked_id", "vendor_code", "fare_amount",
          "trip_distance_km")
    }),

    // The rank family over a window with REAL ties: rank/dense_rank/
    // percent_rank ordered by fare alone (many trips share a fare), where
    // the three functions legitimately differ and are all deterministic
    // under ties because they depend only on the ORDER KEY VALUE, not the
    // arbitrary row order within a tie (unlike row_number). Same
    // one-shuffle per-vendor window as win_ntile; percent_rank is one
    // fixed IEEE division of identical integers.
    "win_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(col("vendor_code")).orderBy(col("fare_amount"))
      dedupedDf(s, d)
        .filter(col("vendor_code").isNotNull && col("fare_amount").isNotNull)
        .select(col("trip_src_id"), col("vendor_code"), col("fare_amount"),
          rank().over(w).cast("long").as("fare_rank"),
          dense_rank().over(w).cast("long").as("fare_dense_rank"),
          percent_rank().over(w).as("fare_pct_rank"))
        .orderBy("vendor_code", "trip_src_id", "fare_amount")
    }),

    // Statistical mode with a deterministic tie-break: the most frequent
    // payment type per vendor (count desc, value asc). Two map-side-
    // combined aggregations — the winner pick runs over the tiny
    // (vendor × payment) census, never the fact rows.
    "agg_mode" -> ((s, d) => {
      val counts = dedupedDf(s, d)
        .filter(col("vendor_code").isNotNull && col("payment_type").isNotNull)
        .groupBy("vendor_code", "payment_type").agg(count(lit(1)).as("cnt"))
      counts.withColumn("rk", row_number().over(
          Window.partitionBy("vendor_code")
            .orderBy(col("cnt").desc, col("payment_type"))))
        .filter(col("rk") === 1)
        .select(col("vendor_code"), col("payment_type").as("mode_payment"), col("cnt"))
        .orderBy("vendor_code")
    }),

    // Pearson correlation fare↔distance per vendor, computed from exact
    // decimal power sums — NOT the built-in corr(), whose streaming
    // (Welford) update accumulates doubles in partition order and is
    // therefore not reproducible run-to-run. Power sums are map-side-
    // combined decimals (order-independent); the closed form runs on the
    // tiny per-vendor census. The closed form is cancellation-heavy
    // (n·sxy − sx·sy), where engines may legally differ in the last ulp
    // (FMA/reassociation) — so the output rounds to 12 decimals on both
    // sides, same as agg_linreg's identical expressions.
    "agg_corr" -> ((s, d) => {
      val v = dedupedDf(s, d).filter(col("vendor_code").isNotNull &&
          col("fare_amount").isNotNull && col("trip_distance_km").isNotNull)
        .select(col("vendor_code"), col("fare_amount").as("x"),
          col("trip_distance_km").as("y"))
      v.groupBy("vendor_code").agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
          sum((col("x") * col("x")).cast("decimal(30,12)")).cast("double").as("sxx"),
          sum((col("y") * col("y")).cast("decimal(30,12)")).cast("double").as("syy"),
          sum((col("x") * col("y")).cast("decimal(30,12)")).cast("double").as("sxy"))
        .select(col("vendor_code"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 12)
            .as("corr_fare_km"))
        .orderBy("vendor_code")
    }),

    // OLS regression fare-on-distance per vendor (slope/intercept/R²)
    // from the same exact decimal power sums as agg_corr — the pricing
    // model a BI team fits without an ML runtime, reproducible because
    // nothing accumulates in partition order. The closed-form ratios are
    // cancellation-heavy (n·sxy − sx·sy), where engines may legally
    // differ in the last ulp (FMA/reassociation), so the outputs are
    // rounded to 12 decimals on both sides — same pattern as every libm
    // call in this file.
    "agg_linreg" -> ((s, d) => {
      val v = dedupedDf(s, d).filter(col("vendor_code").isNotNull &&
          col("fare_amount").isNotNull && col("trip_distance_km").isNotNull)
        .select(col("vendor_code"), col("trip_distance_km").as("x"),
          col("fare_amount").as("y"))
      v.groupBy("vendor_code").agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
          sum((col("x") * col("x")).cast("decimal(30,12)")).cast("double").as("sxx"),
          sum((col("y") * col("y")).cast("decimal(30,12)")).cast("double").as("syy"),
          sum((col("x") * col("y")).cast("decimal(30,12)")).cast("double").as("sxy"))
        .withColumn("slope",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))
        .withColumn("intercept",
          (col("sy") - col("slope") * col("sx")) / col("n"))
        .withColumn("r2",
          ((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))))
        .select(col("vendor_code"), col("n"), round(col("slope"), 12).as("slope"),
          round(col("intercept"), 12).as("intercept"), round(col("r2"), 12).as("r2"))
        .orderBy("vendor_code")
    }),

    // Higher central moments per vendor — skewness + excess kurtosis of
    // the fare distribution, the tail-shape read behind every fare-
    // anomaly threshold. Same exact-decimal power-sum pattern as
    // agg_corr/agg_linreg extended to s3/s4 (one map-side-combined
    // shuffle, O(groups) state); the closed forms are cancellation-heavy
    // doubles, so outputs round to 12 decimals on both sides, and the
    // normalizer is m2·√m2 (sqrt is IEEE-correctly-rounded in both
    // engines) rather than libm pow(x, 1.5), whose last ulp is not.
    "agg_skew_kurtosis" -> ((s, d) => {
      val v = dedupedDf(s, d).filter(col("vendor_code").isNotNull &&
          col("fare_amount").isNotNull)
        .select(col("vendor_code"), col("fare_amount").as("x"))
      v.groupBy("vendor_code").agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(18,6)")).cast("double").as("s1"),
          sum((col("x") * col("x")).cast("decimal(30,12)")).cast("double").as("s2"),
          sum((col("x") * col("x") * col("x")).cast("decimal(38,12)"))
            .cast("double").as("s3"),
          sum((col("x") * col("x") * col("x") * col("x")).cast("decimal(38,12)"))
            .cast("double").as("s4"))
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("m2", col("s2") / col("n") - col("mean") * col("mean"))
        .withColumn("m3", col("s3") / col("n")
          - lit(3.0) * col("mean") * (col("s2") / col("n"))
          + lit(2.0) * col("mean") * col("mean") * col("mean"))
        .withColumn("m4", col("s4") / col("n")
          - lit(4.0) * col("mean") * (col("s3") / col("n"))
          + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n"))
          - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
        .select(col("vendor_code"), col("n"),
          round(col("mean"), 12).as("mean_fare"),
          round(col("m3") / (col("m2") * sqrt(col("m2"))), 12).as("skewness"),
          round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 12)
            .as("kurtosis_excess"))
        .orderBy("vendor_code")
    }),

    // KMV distinct-count sketch vs the exact answer: the deterministic
    // approx_count_distinct replacement (custom TypedImperativeAggregate,
    // O(k) state, map-side partials) whose estimate the DuckDB oracle
    // replays exactly — HLL/approx_count_distinct cannot be oracled.
    "agg_distinct_sketch" -> ((s, d) => dedupedDf(s, d)
      .agg(
        graft.functions.KmvDistinct.of(col("trip_src_id").cast("string"), 256)
          .as("kmv_estimate"),
        countDistinct(col("trip_src_id")).as("exact"))
      .select(col("kmv_estimate"), col("exact"),
        (abs(col("kmv_estimate") - col("exact")) / col("exact")).as("rel_error"))),

    // KMV sketch SET ALGEBRA (the Theta-sketch idea): estimate
    // |A∪B|, |A∩B| and Jaccard between two slices — CARD trips vs
    // fare>20 trips — from their O(k) sketches alone, no second pass
    // over raw data. This is what mergeable summaries buy at 100 TB:
    // per-partition/per-day sketches roll up with array math, and ANY
    // pair of slices can be compared after the fact. One fact scan
    // builds both sketches (conditional inputs) plus the exact answers
    // the oracle scores the estimates against; everything after the
    // single-row agg is pure array expressions. Union estimate = KMV on
    // the k smallest of the merged arrays; intersection via the KMV
    // Jaccard rule (shared hashes within the union's k-min, over k).
    "agg_sketch_setops" -> ((s, d) => {
      val key = col("trip_src_id").cast("string")
      val condA = col("payment_type") === "CARD"
      val condB = col("fare_amount") > 20.0
      val k = 256
      dedupedDf(s, d).agg(
          graft.functions.KmvSketch.of(when(condA, key), k).as("sa"),
          graft.functions.KmvSketch.of(when(condB, key), k).as("sb"),
          countDistinct(when(condA || condB, col("trip_src_id"))).as("exact_union"),
          countDistinct(when(condA && condB, col("trip_src_id"))).as("exact_inter"))
        .withColumn("u_all", array_sort(array_union(col("sa"), col("sb"))))
        .withColumn("u", slice(col("u_all"), 1, k))
        .withColumn("est_union",
          when(size(col("u_all")) < k, size(col("u_all")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(9223372036854775808.0) /
              element_at(col("u"), k).cast("double")))
        .withColumn("in_both", size(array_intersect(col("u"),
          array_intersect(col("sa"), col("sb")))))
        .withColumn("jaccard_est",
          col("in_both").cast("double") / size(col("u")))
        .select(size(col("sa")).cast("long").as("k_a"),
          size(col("sb")).cast("long").as("k_b"),
          col("exact_union"), col("est_union"), col("exact_inter"),
          (col("jaccard_est") * col("est_union")).as("est_inter"),
          col("jaccard_est"))
    }),

    // Grouped KMV: one O(k) sketch per vendor (k=64 so the estimator
    // path, not the exact-below-k path, is exercised per group).
    "agg_sketch_grouped" -> ((s, d) => dedupedDf(s, d)
      .filter(col("vendor_code").isNotNull)
      .groupBy("vendor_code")
      .agg(
        graft.functions.KmvDistinct.of(col("trip_src_id").cast("string"), 64)
          .as("kmv_estimate"),
        countDistinct(col("trip_src_id")).as("exact"))
      .orderBy("vendor_code")),

    // Exact distinct-count KPI (README_modeling.md §7 "Trips =
    // COUNT(DISTINCT trip_id)"); approx_count_distinct is the documented
    // scale opt-in but is engine-specific, so the declared query is exact.
    "agg_count_distinct" -> ((s, d) => factDf(s, d)
      .agg(countDistinct(col("trip_id")).as("distinct_trips"),
        count(lit(1)).as("rows"))),

    "agg_freshness" -> ((s, d) => dedupedDf(s, d)
      .agg(max(col("loaded_at")).as("last_loaded_at"))
      .select(col("last_loaded_at"),
        ((lit("2024-07-01 00:00:00").cast("timestamp").cast("long") -
          col("last_loaded_at").cast("timestamp").cast("long")) / 60)
          .cast("long").as("minutes_behind"))),

    // Exact percentile KPIs (median / p90 fare per vendor) — linear
    // interpolation at (n-1)*q, the same rule DuckDB's quantile_cont uses,
    // so the doubles match bit-for-bit. At 100 TB swap for
    // approx_percentile (documented engine-specific trade).
    "agg_percentile_fare" -> ((s, d) => dedupedDf(s, d)
      .filter(col("vendor_code").isNotNull)
      .groupBy("vendor_code")
      .agg(expr("percentile(fare_amount, 0.5)").as("median_fare"),
        expr("percentile(fare_amount, 0.9)").as("p90_fare"),
        count(lit(1)).as("trips"))
      .orderBy("vendor_code")),

    // ---- §2.6 windows ----
    // Running total + day-over-day delta per vendor: cumulative sums use
    // exact decimal summation inside the window (order-independent under
    // ties — both engines default to the RANGE frame, so tied order keys
    // get equal cumulative values).
    "win_running_total" -> ((s, d) => {
      val daily = dedupedDf(s, d)
        .filter(col("vendor_code").isNotNull)
        .groupBy(col("vendor_code"), col("ingest_date"))
        .agg(dsum("fare_amount").as("day_fare"))
      val w = Window.partitionBy(col("vendor_code")).orderBy(col("ingest_date"))
      daily
        .withColumn("cum_fare",
          sum(col("day_fare").cast("decimal(18,6)")).over(w).cast("double"))
        .withColumn("prev_day_fare", lag(col("day_fare"), 1).over(w))
        .select(col("vendor_code"), col("ingest_date").cast("string").as("ingest_date"),
          col("day_fare"), col("cum_fare"), col("prev_day_fare"))
        .orderBy("vendor_code", "ingest_date")
    }),

    // Gaps-and-islands: contiguous runs of busy service days per vendor
    // (days with >= 3 trips), the classic rn-diff trick — day_id minus
    // the per-vendor row_number is constant exactly within a consecutive
    // run. The window runs over the per-vendor DAY census (bounded by
    // calendar span, not fact size — the daily rollup shrinks the fact
    // first), so the partition can never outgrow a task at any SF;
    // everything downstream is an all-integer groupBy on (vendor, island).
    "win_gaps_islands" -> ((s, d) => {
      val daily = dedupedDf(s, d)
        .filter(col("vendor_code").isNotNull)
        .groupBy(col("vendor_code"), col("ingest_date"))
        .agg(count(lit(1)).as("n_trips"))
        .filter(col("n_trips") >= 3)
      val w = Window.partitionBy(col("vendor_code")).orderBy(col("ingest_date"))
      daily
        .withColumn("island", unix_date(col("ingest_date")) - row_number().over(w))
        .groupBy("vendor_code", "island")
        .agg(min(col("ingest_date")).cast("string").as("start_date"),
          max(col("ingest_date")).cast("string").as("end_date"),
          count(lit(1)).as("n_days"),
          sum(col("n_trips")).as("n_trips"))
        .select("vendor_code", "start_date", "end_date", "n_days", "n_trips")
        .orderBy("vendor_code", "start_date")
    }),
    "win_dedupe_rank" -> ((s, d) => dedupedDf(s, d)
      .select("trip_src_id", "vendor_code", "pickup_ts_utc", "dropoff_ts_utc",
        "trip_distance_km", "fare_amount", "payment_type", "source_file_name")
      .orderBy("trip_src_id", "source_file_name", "vendor_code", "payment_type",
        "fare_amount", "trip_distance_km")),

    "win_global_rownum" -> ((s, d) => {
      // Global ordered ROW_NUMBER via the scalable two-pass shape
      // (ops/GlobalRowNumber: range repartition → per-partition counts →
      // offset + partition-local window). No single-task sort — SURVEY
      // §7.4 hard-part 2 resolved rather than documented-around.
      graft.ops.GlobalRowNumber.withRowNumber(
          trips(s, d).select("source_file_name", "loaded_at", "trip_src_id"), "rn",
          Seq("source_file_name", "loaded_at", "trip_src_id"))
        .select("rn", "trip_src_id", "source_file_name")
        .orderBy("rn")
    }),

    "win_join_pick" -> ((s, d) => {
      // Project to the 3 window columns, then hash-repartition on the
      // window key BEFORE the window: the fixture scan is one parquet row
      // group (guide §2.5 input skew), so the window's partial sort +
      // WindowGroupLimit otherwise ran on the union's 2 tasks; the
      // explicit repartition (count = spark.sql.shuffle.partitions,
      // scale-adaptive) satisfies the window's ClusteredDistribution, so
      // no second exchange appears and the sort runs at full parallelism.
      val dup = TaxiModel.tripsWithDups(s, d)
        .select("trip_src_id", "loaded_at", "source_file_name")
        .repartition(s.sessionState.conf.numShufflePartitions, col("trip_src_id"))
      val w = Window.partitionBy(col("trip_src_id"))
        .orderBy(col("loaded_at").desc, col("source_file_name").desc)
      dup.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("trip_src_id", "source_file_name")
        .orderBy("trip_src_id")
    }),

    // ---- §2.7 sorts / limits / set ops ----
    "sort_topn" -> ((s, d) => dedupedDf(s, d)
      .orderBy(col("loaded_at").desc, col("trip_src_id").desc, col("fare_amount").desc)
      .select("trip_src_id", "loaded_at", "fare_amount")
      .limit(50)),

    "setop_union_distinct" -> ((s, d) => {
      val t = trips(s, d)
      t.select(col("pu_location_id").as("location_id"))
        .union(t.select(col("do_location_id")))
        .filter(col("location_id").isNotNull).distinct()
        .orderBy("location_id")
    }),

    // INTERSECT / EXCEPT complete the §2.7 set-op family: locations that
    // appear as BOTH pickup and dropoff, and pickup-only locations. Both
    // plan as an aggregate-style hash set-op on the location key (one
    // shuffle over the two narrow projections — never a join of the
    // fact), and both are DISTINCT set semantics in Spark and SQL alike.
    "setop_intersect" -> ((s, d) => {
      val t = trips(s, d)
      t.select(col("pu_location_id").as("location_id"))
        .filter(col("location_id").isNotNull)
        .intersect(t.select(col("do_location_id").as("location_id"))
          .filter(col("location_id").isNotNull))
        .orderBy("location_id")
    }),

    "setop_except" -> ((s, d) => {
      val t = trips(s, d)
      t.select(col("pu_location_id").as("location_id"))
        .filter(col("location_id").isNotNull)
        .except(t.select(col("do_location_id").as("location_id"))
          .filter(col("location_id").isNotNull))
        .orderBy("location_id")
    }),

    // multiset difference (EXCEPT ALL): pickup visits minus dropoff
    // visits per location KEEPING multiplicity — the per-location net
    // surplus the distinct-semantics setop_except cannot express; the
    // count regroup makes the multiplicities visible in the result
    "setop_except_all" -> ((s, d) => {
      val t = trips(s, d)
      t.select(col("pu_location_id").as("location_id"))
        .filter(col("location_id").isNotNull)
        .exceptAll(t.select(col("do_location_id").as("location_id"))
          .filter(col("location_id").isNotNull))
        .groupBy("location_id").agg(count(lit(1)).as("surplus"))
        .orderBy("location_id")
    }),

    // multiset intersection (INTERSECT ALL): min(pickup visits, dropoff
    // visits) per location — the balanced-traffic count
    "setop_intersect_all" -> ((s, d) => {
      val t = trips(s, d)
      t.select(col("pu_location_id").as("location_id"))
        .filter(col("location_id").isNotNull)
        .intersectAll(t.select(col("do_location_id").as("location_id"))
          .filter(col("location_id").isNotNull))
        .groupBy("location_id").agg(count(lit(1)).as("common_visits"))
        .orderBy("location_id")
    }),

    "setop_union_all" -> ((s, d) => {
      // DQ-gate result set built as a UNION ALL chain (CoreDQ_Gate shape).
      val t = trips(s, d)
      val agg = t.agg(
        count(lit(1)).as("stg_rows"),
        sum(when(TaxiModel.domainFilter, 1).otherwise(0)).cast("long").as("core_rows"),
        sum(when(col("fare_amount") < 0, 1).otherwise(0)).cast("long").as("neg_fare"),
        sum(when(col("pickup_ts").isNull, 1).otherwise(0)).cast("long").as("null_pickup"))
      val checks = agg.select(
        struct(lit("rowcount_core_gt_0").as("check_name"),
          when(col("core_rows") > 0, "PASSED").otherwise("FAILED").as("status")).as("c1"),
        struct(lit("no_negative_fare").as("check_name"),
          when(col("neg_fare") === 0, "PASSED").otherwise("WARNING").as("status")).as("c2"),
        struct(lit("no_null_pickup_ts").as("check_name"),
          when(col("null_pickup") === 0, "PASSED").otherwise("FAILED").as("status")).as("c3"),
        struct(lit("core_le_stg").as("check_name"),
          when(col("core_rows") <= col("stg_rows"), "PASSED").otherwise("FAILED").as("status")).as("c4"))
      checks.select(col("c1")).union(checks.select(col("c2")))
        .union(checks.select(col("c3"))).union(checks.select(col("c4")))
        .select(col("c1.check_name").as("check_name"), col("c1.status").as("status"))
        .orderBy("check_name")
    }))

  val oracles: Map[String, String] = Map(
    "clean_typing" -> taxi(
      """SELECT trip_src_id,
        |  TRY_CAST(id_str AS BIGINT) AS id_typed,
        |  TRY_CAST(fare_str AS DOUBLE) AS fare_typed,
        |  CAST(TRY_CAST(date_str AS DATE) AS VARCHAR) AS date_typed
        |FROM (SELECT trip_src_id,
        |        CASE WHEN trip_src_id % 17 = 0 THEN 'N/A'
        |             ELSE CAST(trip_src_id AS VARCHAR) END AS id_str,
        |        CASE WHEN trip_src_id % 2 = 0 THEN '1997-05-30'
        |             ELSE 'not-a-date' END AS date_str,
        |        printf('%.6f', fare_amount) AS fare_str
        |      FROM trips) t
        |ORDER BY trip_src_id, fare_typed""".stripMargin),

    "clean_trim_null" -> taxi(
      """SELECT trip_src_id, upper(nullif(trim(vendor_raw), '')) AS vendor_code
        |FROM trips ORDER BY trip_src_id, vendor_code NULLS FIRST""".stripMargin),

    "filter_domain" -> taxi(
      """SELECT trip_src_id, pickup_ts, dropoff_ts, fare_amount, trip_distance_mi
        |FROM trips
        |WHERE pickup_ts IS NOT NULL AND dropoff_ts IS NOT NULL
        |  AND pickup_ts <= dropoff_ts AND fare_amount >= 0 AND trip_distance_mi >= 0
        |ORDER BY trip_src_id, fare_amount, trip_distance_mi""".stripMargin),

    "route_rejects" -> taxi(
      """SELECT trip_src_id,
        |  CASE WHEN pickup_ts IS NULL OR dropoff_ts IS NULL THEN 'NULL_TIME'
        |       WHEN fare_amount < 0 THEN 'NEGATIVE_FARE'
        |       WHEN trip_distance_mi < 0 THEN 'NEGATIVE_DISTANCE'
        |       WHEN pickup_ts > dropoff_ts THEN 'PICKUP_AFTER_DROPOFF'
        |       ELSE 'OTHER_BAD_VALUES' END AS reject_reason
        |FROM trips
        |WHERE pickup_ts IS NULL OR dropoff_ts IS NULL OR pickup_ts > dropoff_ts
        |   OR fare_amount < 0 OR trip_distance_mi < 0
        |ORDER BY trip_src_id, reject_reason""".stripMargin),

    "filter_slice" -> taxi(
      """SELECT trip_src_id, CAST(ingest_date AS VARCHAR) AS ingest_date, fare_amount
        |FROM trips
        |WHERE ingest_date BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
        |ORDER BY trip_src_id, fare_amount""".stripMargin),

    "f_unit_convert" -> taxi(
      """SELECT trip_src_id, round(trip_distance_mi * 1.609344, 3) AS trip_distance_km
        |FROM trips ORDER BY trip_src_id, trip_distance_km""".stripMargin),

    "f_payment_canon" -> taxi(
      """SELECT trip_src_id,
        |  CASE trim(payment_src) WHEN '1' THEN 'CARD' WHEN '2' THEN 'CASH'
        |    WHEN '3' THEN 'NO_CHARGE' WHEN '4' THEN 'DISPUTE' END AS payment_std
        |FROM trips ORDER BY trip_src_id, payment_std NULLS FIRST""".stripMargin),

    "f_night_flag" -> taxi(
      """SELECT trip_src_id, CAST(hour(pickup_ts) AS INT) AS pickup_hour,
        |  CASE WHEN hour(pickup_ts) >= 22 OR hour(pickup_ts) <= 5
        |       THEN 1 ELSE 0 END AS is_night_ride
        |FROM trips WHERE pickup_ts IS NOT NULL
        |ORDER BY trip_src_id, pickup_hour, is_night_ride""".stripMargin),

    "f_date_key" -> taxi(
      """SELECT trip_src_id,
        |  CAST(year(pickup_ts) * 10000 + month(pickup_ts) * 100
        |       + day(pickup_ts) AS INT) AS pickup_date_key
        |FROM trips WHERE pickup_ts IS NOT NULL
        |ORDER BY trip_src_id, pickup_date_key""".stripMargin),

    "f_time_key" -> taxi(
      """SELECT trip_src_id,
        |  CAST(hour(pickup_ts) * 3600 + minute(pickup_ts) * 60
        |       + second(pickup_ts) AS INT) AS pickup_time_key
        |FROM trips WHERE pickup_ts IS NOT NULL
        |ORDER BY trip_src_id, pickup_time_key""".stripMargin),

    "f_duration_min" -> taxi(
      """SELECT trip_src_id,
        |  date_diff('minute', pickup_ts, dropoff_ts) AS duration_min
        |FROM trips WHERE pickup_ts IS NOT NULL AND dropoff_ts IS NOT NULL
        |ORDER BY trip_src_id, duration_min""".stripMargin),

    "f_sha256_hex" -> taxi(
      """SELECT trip_src_id, source_file_name,
        |  sha256(concat_ws('|',
        |    coalesce(vendor_code, ''),
        |    coalesce(strftime(pickup_ts_utc, '%Y-%m-%dT%H:%M:%S.%g'), ''),
        |    coalesce(strftime(dropoff_ts_utc, '%Y-%m-%dT%H:%M:%S.%g'), ''),
        |    coalesce(printf('%.6f', fare_amount), ''),
        |    coalesce(printf('%.6f', trip_distance_km), ''),
        |    coalesce(payment_type, ''))) AS trip_id
        |FROM cleaned ORDER BY trip_src_id, source_file_name, trip_id""".stripMargin),

    "f_hash64_id" -> taxi(
      """SELECT trip_src_id,
        |  abs(CASE WHEN u >= 9223372036854775808::UBIGINT
        |           THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
        |           ELSE CAST(u AS BIGINT) END) AS stream_trip_id
        |FROM (
        |  SELECT trip_src_id,
        |    ('0x' || substr(sha256(concat_ws('|', 'e', CAST(trip_src_id AS VARCHAR),
        |      strftime(pickup_ts, '%Y-%m-%dT%H:%M:%S.%g'),
        |      strftime(dropoff_ts, '%Y-%m-%dT%H:%M:%S.%g'))), 1, 16))::UBIGINT AS u
        |  FROM trips WHERE pickup_ts IS NOT NULL AND dropoff_ts IS NOT NULL) t
        |ORDER BY trip_src_id, stream_trip_id""".stripMargin),

    "f_basename" -> taxi(
      """SELECT trip_src_id,
        |  regexp_extract('lake/date=2024/06/01/' || source_file_name, '[^/]*$')
        |    AS file_name
        |FROM trips ORDER BY trip_src_id, file_name""".stripMargin),

    "f_truncate" -> taxi(
      """SELECT trip_src_id, left(source_file_name, 6) AS file_prefix,
        |  left(payment_src, 2) AS payment16
        |FROM trips ORDER BY trip_src_id, file_prefix, payment16""".stripMargin),

    "f_iso_format" -> taxi(
      """SELECT trip_src_id,
        |  strftime(pickup_ts, '%Y-%m-%dT%H:%M:%S.%g') AS pickup_iso
        |FROM trips WHERE pickup_ts IS NOT NULL
        |ORDER BY trip_src_id, pickup_iso""".stripMargin),

    "f_concat_payload" -> taxi(
      """SELECT trip_src_id,
        |  concat_ws('; ',
        |    'vendor=' || coalesce(vendor_raw, 'NULL'),
        |    'fare=' || coalesce(printf('%.6f', fare_amount), 'NULL'),
        |    'rate=' || coalesce(CAST(rate_code AS VARCHAR), 'NULL'),
        |    'pickup=' || coalesce(strftime(pickup_ts, '%Y-%m-%dT%H:%M:%S.%g'), 'NULL'))
        |    AS raw_payload
        |FROM trips ORDER BY trip_src_id, raw_payload""".stripMargin),

    "f_json_build" -> taxi(
      """SELECT to_json(struct_pack(bad_rows := bad_rows,
        |                           negative_fare := negative_fare))::VARCHAR AS audit_json
        |FROM (
        |  SELECT count(*) AS bad_rows,
        |    CAST(coalesce(sum(CASE WHEN fare_amount < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |      AS negative_fare
        |  FROM trips
        |  WHERE pickup_ts IS NULL OR dropoff_ts IS NULL OR pickup_ts > dropoff_ts
        |     OR fare_amount < 0 OR trip_distance_mi < 0) t""".stripMargin),

    "f_to_date" -> taxi(
      """SELECT trip_src_id,
        |  CAST(CAST(coalesce(pickup_ts, TIMESTAMP '2024-01-01 00:00:00') AS DATE)
        |    AS VARCHAR) AS ingest_date_derived
        |FROM trips ORDER BY trip_src_id, ingest_date_derived""".stripMargin),

    "f_safe_divide" -> taxi(
      """SELECT trip_src_id,
        |  CASE WHEN fare_amount > 0 THEN tip_amount / fare_amount END AS tip_pct,
        |  CASE WHEN trip_distance_mi > 0 THEN fare_amount / trip_distance_mi END
        |    AS fare_per_mile
        |FROM trips
        |ORDER BY trip_src_id, tip_pct NULLS FIRST, fare_per_mile NULLS FIRST""".stripMargin),

    "join_ref_lookup" -> taxi(
      """SELECT t.trip_src_id,
        |  coalesce(pm.payment_type_std, 'UNKNOWN') AS payment_type
        |FROM trips t
        |LEFT JOIN (SELECT payment_type_src, payment_type_std FROM payment_map
        |           WHERE is_active) pm
        |  ON trim(t.payment_src) = pm.payment_type_src
        |ORDER BY t.trip_src_id, payment_type""".stripMargin),

    "upsert_dim_antijoin" -> taxiWith(
      """existing AS (
        |  SELECT loc_nk, CAST(row_number() OVER (ORDER BY loc_nk) AS INT) AS loc_sk
        |  FROM (SELECT DISTINCT loc_nk FROM (
        |          SELECT pu_location_id AS loc_nk FROM deduped WHERE ingest_date < DATE '1996-01-01'
        |          UNION
        |          SELECT do_location_id FROM deduped WHERE ingest_date < DATE '1996-01-01') u
        |        WHERE loc_nk IS NOT NULL) x
        |), novel AS (
        |  SELECT DISTINCT pu_location_id AS loc_nk FROM deduped
        |  WHERE pu_location_id IS NOT NULL
        |    AND pu_location_id NOT IN (SELECT loc_nk FROM existing)
        |)""".stripMargin,
      """SELECT loc_nk, loc_sk FROM existing
        |UNION ALL
        |SELECT loc_nk,
        |  CAST((SELECT coalesce(max(loc_sk), 0) FROM existing)
        |       + row_number() OVER (ORDER BY loc_nk) AS INT) AS loc_sk
        |FROM novel
        |ORDER BY loc_sk""".stripMargin),

    "join_fact_dims" -> taxi(
      """SELECT trip_id, pickup_date_key, pickup_time_key, vendor_sk, payment_sk,
        |  rate_sk, flag_sk, pu_location_sk, do_location_sk, fare_amount, is_night_ride
        |FROM fact ORDER BY trip_id, pickup_date_key""".stripMargin),

    "join_core_stg_correlate" -> taxi(
      """SELECT trip_src_id, tolls_amount, total_amount FROM (
        |  SELECT c.trip_src_id, s.tolls_amount, s.total_amount,
        |    row_number() OVER (PARTITION BY c.trip_src_id
        |      ORDER BY s.loaded_at DESC, s.source_file_name DESC, s.trip_src_id DESC,
        |               s.tolls_amount DESC, s.total_amount DESC) AS rn
        |  FROM deduped c
        |  LEFT JOIN trips_dup s
        |    ON c.ingest_date = s.ingest_date
        |   AND c.source_file_name = s.source_file_name
        |   AND c.pickup_ts_utc = s.pickup_ts
        |   AND c.dropoff_ts_utc = s.dropoff_ts) j
        |WHERE rn = 1
        |ORDER BY trip_src_id, tolls_amount, total_amount""".stripMargin),

    "merge_upsert_key" -> taxiWith(
      """target AS (
        |  SELECT trip_id, fare_amount, total_amount FROM fact
        |  WHERE ingest_date < DATE '1997-01-01'
        |), staged AS (
        |  SELECT trip_id, fare_amount, total_amount + 1.0 AS total_amount FROM fact
        |  WHERE ingest_date BETWEEN DATE '1996-06-01' AND DATE '1997-12-31'
        |)""".stripMargin,
      """SELECT coalesce(s.trip_id, t.trip_id) AS trip_id,
        |  CASE WHEN s.trip_id IS NOT NULL THEN s.fare_amount ELSE t.fare_amount END
        |    AS fare_amount,
        |  CASE WHEN s.trip_id IS NOT NULL THEN s.total_amount ELSE t.total_amount END
        |    AS total_amount,
        |  CASE WHEN s.trip_id IS NOT NULL AND t.trip_id IS NOT NULL THEN 'updated'
        |       WHEN s.trip_id IS NOT NULL THEN 'inserted'
        |       ELSE 'unchanged' END AS merge_action
        |FROM staged s FULL OUTER JOIN target t ON s.trip_id = t.trip_id
        |ORDER BY trip_id""".stripMargin),

    "join_star_view" -> taxi(
      """SELECT f.trip_id, dv.vendor_nk, dp.payment_nk, f.fare_amount,
        |  f.trip_distance_km,
        |  CASE WHEN f.fare_amount > 0 THEN f.tip_amount / f.fare_amount END AS tip_pct,
        |  CASE WHEN f.trip_distance_km > 0 THEN f.fare_amount / f.trip_distance_km END
        |    AS fare_per_km
        |FROM fact f
        |LEFT JOIN dim_vendor dv ON f.vendor_sk = dv.vendor_sk
        |LEFT JOIN dim_payment dp ON f.payment_sk = dp.payment_sk
        |ORDER BY f.trip_id""".stripMargin),

    "dim_date_attrs" -> taxiWith(
      """span AS (
        |  SELECT min(CAST(pickup_ts_utc AS DATE)) AS lo,
        |         max(CAST(pickup_ts_utc AS DATE)) AS hi
        |  FROM deduped
        |), dates AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |    AS date_value FROM span
        |)""".stripMargin,
      """SELECT
        |  CAST(year(date_value)*10000 + month(date_value)*100 + day(date_value)
        |    AS INT) AS date_key,
        |  CAST(date_value AS VARCHAR) AS date_value,
        |  CAST(year(date_value) AS INT) AS "year",
        |  CAST(quarter(date_value) AS INT) AS "quarter",
        |  CAST(month(date_value) AS INT) AS "month",
        |  CAST(day(date_value) AS INT) AS "day",
        |  CAST(floor((dayofyear(date_value) - 1 +
        |    (date_diff('day', DATE '1970-01-01', date_trunc('year', date_value)) + 4) % 7
        |    ) / 7) + 1 AS INT) AS week_of_year,
        |  CAST(isoyear(date_value) AS INT) AS iso_year,
        |  CAST(weekofyear(date_value) AS INT) AS iso_week,
        |  ((date_diff('day', DATE '1970-01-01', date_value) + 4) % 7) IN (0, 6)
        |    AS is_weekend,
        |  false AS is_holiday
        |FROM dates ORDER BY date_key""".stripMargin),

    "dim_time_attrs" ->
      """SELECT CAST(range AS INT) AS time_key,
        |  CAST(range // 3600 AS INT) AS hh24,
        |  CAST((range % 3600) // 60 AS INT) AS mm,
        |  CAST(range % 60 AS INT) AS ss,
        |  printf('%02d:00-%02d:59', range // 3600, range // 3600) AS hour_bucket,
        |  (range // 3600 >= 22 OR range // 3600 <= 5) AS is_night
        |FROM range(86400) ORDER BY time_key""".stripMargin,

    "join_calendar" -> taxiWith(
      """span AS (
        |  SELECT min(CAST(pickup_ts_utc AS DATE)) AS lo,
        |         max(CAST(pickup_ts_utc AS DATE)) AS hi
        |  FROM deduped
        |), dd AS (
        |  SELECT
        |    CAST(year(dv)*10000 + month(dv)*100 + day(dv) AS INT) AS date_key,
        |    CAST(year(dv) AS INT) AS "year",
        |    ((date_diff('day', DATE '1970-01-01', dv) + 4) % 7) IN (0, 6) AS is_weekend
        |  FROM (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |          AS dv FROM span) x
        |), tt AS (
        |  SELECT CAST(range AS INT) AS time_key,
        |    (range // 3600 >= 22 OR range // 3600 <= 5) AS is_night
        |  FROM range(86400)
        |)""".stripMargin,
      s"""SELECT dd."year", dd.is_weekend, tt.is_night,
         |  count(*) AS trips, ${dsumSql("f.fare_amount")} AS total_fare
         |FROM fact f
         |JOIN dd ON dd.date_key = f.pickup_date_key
         |LEFT JOIN tt ON tt.time_key = f.pickup_time_key
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    "agg_rollup_calendar" -> taxiWith(
      """span AS (
        |  SELECT min(CAST(pickup_ts_utc AS DATE)) AS lo,
        |         max(CAST(pickup_ts_utc AS DATE)) AS hi
        |  FROM deduped
        |), dd AS (
        |  SELECT
        |    CAST(year(dv)*10000 + month(dv)*100 + day(dv) AS INT) AS date_key,
        |    CAST(year(dv) AS INT) AS "year",
        |    CAST(quarter(dv) AS INT) AS "quarter"
        |  FROM (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |          AS dv FROM span) x
        |)""".stripMargin,
      s"""SELECT dd."year", dd."quarter", count(*) AS trips,
         |  ${dsumSql("f.fare_amount")} AS total_fare,
         |  CAST(GROUPING(dd."year") AS INT) AS g_year,
         |  CAST(GROUPING(dd."quarter") AS INT) AS g_quarter
         |FROM fact f JOIN dd ON dd.date_key = f.pickup_date_key
         |GROUP BY ROLLUP (dd."year", dd."quarter")
         |ORDER BY g_year, g_quarter, dd."year", dd."quarter"""".stripMargin),

    "join_asof" -> taxiWith(
      s"""rates AS (
         |  SELECT vendor_code, CAST(ingest_date AS TIMESTAMP) AS rate_ts,
         |    ${dsumSql("fare_amount")} / count(*) AS day_rate
         |  FROM deduped WHERE vendor_code IS NOT NULL
         |  GROUP BY vendor_code, ingest_date)""".stripMargin,
      """SELECT d.trip_src_id, d.vendor_code, r.day_rate
        |FROM (SELECT trip_src_id, vendor_code, pickup_ts_utc FROM deduped
        |      WHERE vendor_code IS NOT NULL) d
        |ASOF LEFT JOIN rates r
        |  ON d.vendor_code = r.vendor_code AND d.pickup_ts_utc >= r.rate_ts
        |ORDER BY d.trip_src_id, d.vendor_code, r.day_rate""".stripMargin),

    "join_asof_tolerance" -> taxiWith(
      s"""rates AS (
         |  SELECT vendor_code,
         |    CAST(ingest_date AS DATE) - DATE '1970-01-01' AS rate_day,
         |    ${dsumSql("fare_amount")} / count(*) AS day_rate
         |  FROM deduped WHERE vendor_code IS NOT NULL
         |  GROUP BY vendor_code, ingest_date)""".stripMargin,
      """SELECT d.trip_src_id, d.vendor_code,
        |  CASE WHEN d.pickup_day - r.rate_day <= 2 THEN r.day_rate END AS day_rate
        |FROM (SELECT trip_src_id, vendor_code,
        |        CAST(pickup_ts_utc AS DATE) - DATE '1970-01-01' AS pickup_day
        |      FROM deduped WHERE vendor_code IS NOT NULL) d
        |ASOF LEFT JOIN rates r
        |  ON d.vendor_code = r.vendor_code AND d.pickup_day >= r.rate_day
        |ORDER BY d.trip_src_id, d.vendor_code, day_rate""".stripMargin),

    "join_asof_fwd" -> taxiWith(
      s"""rates AS (
         |  SELECT vendor_code, CAST(ingest_date AS TIMESTAMP) AS rate_ts,
         |    ${dsumSql("fare_amount")} / count(*) AS day_rate
         |  FROM deduped WHERE vendor_code IS NOT NULL
         |  GROUP BY vendor_code, ingest_date)""".stripMargin,
      """SELECT d.trip_src_id, d.vendor_code, r.day_rate
        |FROM (SELECT trip_src_id, vendor_code, pickup_ts_utc FROM deduped
        |      WHERE vendor_code IS NOT NULL) d
        |ASOF LEFT JOIN rates r
        |  ON d.vendor_code = r.vendor_code AND d.pickup_ts_utc <= r.rate_ts
        |ORDER BY d.trip_src_id, d.vendor_code, r.day_rate NULLS FIRST""".stripMargin),

    "join_range" -> taxiWith(
      """bands AS (
        |  SELECT printf('hh%02d_%02d', CAST(r // 2 AS INT), CAST(30 * (r % 2) AS INT)) AS band,
        |         r * 1800 AS lo, r * 1800 + 1799 AS hi
        |  FROM (SELECT unnest(generate_series(0, 47)) AS r) g
        |  UNION ALL SELECT 'morning', 21600, 43199
        |  UNION ALL SELECT 'evening', 57600, 79199
        |), pts AS (
        |  SELECT trip_src_id, fare_amount,
        |    hour(pickup_ts_utc) * 3600 + minute(pickup_ts_utc) * 60
        |      + second(pickup_ts_utc) AS tk
        |  FROM deduped)""".stripMargin,
      s"""SELECT b.band, count(*) AS trips,
         |  ${dsumSql("p.fare_amount")} AS total_fare
         |FROM pts p JOIN bands b ON p.tk BETWEEN b.lo AND b.hi
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    "agg_percentile_fare" -> taxi(
      """SELECT vendor_code,
        |  quantile_cont(fare_amount, 0.5) AS median_fare,
        |  quantile_cont(fare_amount, 0.9) AS p90_fare,
        |  count(*) AS trips
        |FROM deduped WHERE vendor_code IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "win_running_total" -> taxiWith(
      s"""daily AS (
         |  SELECT vendor_code, ingest_date,
         |    ${dsumSql("fare_amount")} AS day_fare
         |  FROM deduped WHERE vendor_code IS NOT NULL
         |  GROUP BY 1, 2)""".stripMargin,
      """SELECT vendor_code, CAST(ingest_date AS VARCHAR) AS ingest_date,
        |  day_fare,
        |  CAST(SUM(CAST(day_fare AS DECIMAL(18,6))) OVER (
        |    PARTITION BY vendor_code ORDER BY ingest_date) AS DOUBLE) AS cum_fare,
        |  lag(day_fare, 1) OVER (
        |    PARTITION BY vendor_code ORDER BY ingest_date) AS prev_day_fare
        |FROM daily ORDER BY vendor_code, ingest_date""".stripMargin),

    "agg_counts_by_slice" -> taxi(
      """SELECT CAST(ingest_date AS VARCHAR) AS ingest_date, count(*) AS rows_out
        |FROM deduped GROUP BY 1 ORDER BY ingest_date""".stripMargin),

    "agg_sum_reconcile" -> taxi(
      s"""SELECT c.core_fare, f.fact_fare, c.core_fare = f.fact_fare AS fare_matches
         |FROM (SELECT ${dsumSql("fare_amount")} AS core_fare FROM deduped) c
         |CROSS JOIN (SELECT ${dsumSql("fare_amount")} AS fact_fare FROM fact) f""".stripMargin),

    "agg_dupe_check" -> taxi(
      """SELECT count(*) AS dup_groups,
        |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS dup_rows
        |FROM (
        |  SELECT count(*) AS cnt FROM cleaned
        |  GROUP BY vendor_code, pickup_ts_utc, dropoff_ts_utc,
        |           trip_distance_km, fare_amount, payment_type
        |  HAVING count(*) > 1) g""".stripMargin),

    "agg_distinct_nk" -> taxi(
      """SELECT DISTINCT vendor_code FROM deduped WHERE vendor_code IS NOT NULL
        |ORDER BY vendor_code""".stripMargin),

    "agg_reason_pivot" -> taxi(
      """SELECT
        |  CAST(sum(CASE WHEN reject_reason = 'NULL_TIME' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_time,
        |  CAST(sum(CASE WHEN reject_reason = 'NEGATIVE_FARE' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS negative_fare,
        |  CAST(sum(CASE WHEN reject_reason = 'NEGATIVE_DISTANCE' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS negative_distance,
        |  CAST(sum(CASE WHEN reject_reason = 'PICKUP_AFTER_DROPOFF' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS pickup_after_dropoff
        |FROM (
        |  SELECT CASE WHEN pickup_ts IS NULL OR dropoff_ts IS NULL THEN 'NULL_TIME'
        |              WHEN fare_amount < 0 THEN 'NEGATIVE_FARE'
        |              WHEN trip_distance_mi < 0 THEN 'NEGATIVE_DISTANCE'
        |              WHEN pickup_ts > dropoff_ts THEN 'PICKUP_AFTER_DROPOFF'
        |              ELSE 'OTHER_BAD_VALUES' END AS reject_reason
        |  FROM trips
        |  WHERE pickup_ts IS NULL OR dropoff_ts IS NULL OR pickup_ts > dropoff_ts
        |     OR fare_amount < 0 OR trip_distance_mi < 0) r""".stripMargin),

    "agg_reject_breakdown" -> taxi(
      """SELECT CASE WHEN pickup_ts IS NULL OR dropoff_ts IS NULL THEN 'NULL_TIME'
        |            WHEN fare_amount < 0 THEN 'NEGATIVE_FARE'
        |            WHEN trip_distance_mi < 0 THEN 'NEGATIVE_DISTANCE'
        |            WHEN pickup_ts > dropoff_ts THEN 'PICKUP_AFTER_DROPOFF'
        |            ELSE 'OTHER_BAD_VALUES' END AS reject_reason,
        |  count(*) AS cnt
        |FROM trips
        |WHERE pickup_ts IS NULL OR dropoff_ts IS NULL OR pickup_ts > dropoff_ts
        |   OR fare_amount < 0 OR trip_distance_mi < 0
        |GROUP BY 1 ORDER BY cnt DESC, reject_reason""".stripMargin),

    "agg_bi_measures" -> taxi(
      s"""SELECT vendor_sk, count(*) AS trips,
         |  ${dsumSql("fare_amount")} AS total_fare,
         |  ${dsumSql("tip_amount")} / nullif(${dsumSql("fare_amount")}, 0.0) AS tip_pct,
         |  ${dsumSql("fare_amount")} / count(*) AS avg_fare_per_trip,
         |  ${dsumSql("fare_amount")} / nullif(${dsumSql("trip_distance_km")}, 0.0)
         |    AS avg_fare_per_km
         |FROM fact GROUP BY vendor_sk ORDER BY vendor_sk""".stripMargin),

    "agg_cube" -> taxi(
      s"""SELECT vendor_code, rate_code, count(*) AS trips,
         |  ${dsumSql("fare_amount")} AS total_fare,
         |  CAST(GROUPING(vendor_code) AS INT) AS g_vendor,
         |  CAST(GROUPING(rate_code) AS INT) AS g_rate
         |FROM deduped WHERE vendor_code IS NOT NULL
         |GROUP BY CUBE(vendor_code, rate_code)
         |ORDER BY g_vendor, g_rate, vendor_code, rate_code""".stripMargin),

    "agg_grouping_sets" -> taxi(
      s"""SELECT vendor_code, rate_code, count(*) AS trips,
         |  ${dsumSql("fare_amount")} AS total_fare,
         |  CAST(GROUPING(vendor_code) AS INT) AS g_vendor,
         |  CAST(GROUPING(rate_code) AS INT) AS g_rate
         |FROM deduped WHERE vendor_code IS NOT NULL
         |GROUP BY GROUPING SETS ((vendor_code), (rate_code), ())
         |ORDER BY g_vendor, g_rate, vendor_code, rate_code""".stripMargin),

    "win_ntile" -> taxi(
      """SELECT trip_src_id, vendor_code, fare_amount,
        |  CAST(ntile(4) OVER w AS INT) AS fare_quartile,
        |  cume_dist() OVER w AS cume
        |FROM deduped
        |WHERE vendor_code IS NOT NULL AND fare_amount IS NOT NULL
        |WINDOW w AS (PARTITION BY vendor_code ORDER BY fare_amount, trip_src_id)
        |ORDER BY vendor_code, trip_src_id, fare_amount""".stripMargin),

    "secure_view_mask" -> taxi(
      """SELECT sha256(CAST(trip_src_id AS VARCHAR)) AS masked_id,
        |  vendor_code, fare_amount, trip_distance_km
        |FROM deduped
        |WHERE vendor_code IS NOT NULL AND fare_amount > 0
        |  AND trip_distance_km IS NOT NULL
        |ORDER BY masked_id, vendor_code, fare_amount,
        |  trip_distance_km""".stripMargin),

    "win_rank_family" -> taxi(
      """SELECT trip_src_id, vendor_code, fare_amount,
        |  CAST(rank() OVER w AS BIGINT) AS fare_rank,
        |  CAST(dense_rank() OVER w AS BIGINT) AS fare_dense_rank,
        |  percent_rank() OVER w AS fare_pct_rank
        |FROM deduped
        |WHERE vendor_code IS NOT NULL AND fare_amount IS NOT NULL
        |WINDOW w AS (PARTITION BY vendor_code ORDER BY fare_amount)
        |ORDER BY vendor_code, trip_src_id, fare_amount""".stripMargin),

    "agg_mode" -> taxiWith(
      """pcounts AS (
        |  SELECT vendor_code, payment_type, count(*) AS cnt FROM deduped
        |  WHERE vendor_code IS NOT NULL AND payment_type IS NOT NULL
        |  GROUP BY 1, 2)""".stripMargin,
      """SELECT vendor_code, payment_type AS mode_payment, cnt FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vendor_code
        |    ORDER BY cnt DESC, payment_type) AS rk FROM pcounts) x
        |WHERE rk = 1 ORDER BY vendor_code""".stripMargin),

    "agg_corr" -> taxiWith(
      """cagg AS (
        |  SELECT vendor_code, count(*) AS n,
        |    CAST(SUM(CAST(fare_amount AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(trip_distance_km AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(fare_amount * fare_amount AS DECIMAL(30,12))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(trip_distance_km * trip_distance_km AS DECIMAL(30,12))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(fare_amount * trip_distance_km AS DECIMAL(30,12))) AS DOUBLE) AS sxy
        |  FROM deduped
        |  WHERE vendor_code IS NOT NULL AND fare_amount IS NOT NULL
        |    AND trip_distance_km IS NOT NULL
        |  GROUP BY 1)""".stripMargin,
      """SELECT vendor_code, n,
        |  round((n * sxy - sx * sy) /
        |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr_fare_km
        |FROM cagg ORDER BY vendor_code""".stripMargin),

    "agg_linreg" -> taxiWith(
      """lragg AS (
        |  SELECT vendor_code, count(*) AS n,
        |    CAST(SUM(CAST(trip_distance_km AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(fare_amount AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(trip_distance_km * trip_distance_km AS DECIMAL(30,12))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(fare_amount * fare_amount AS DECIMAL(30,12))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(trip_distance_km * fare_amount AS DECIMAL(30,12))) AS DOUBLE) AS sxy
        |  FROM deduped
        |  WHERE vendor_code IS NOT NULL AND fare_amount IS NOT NULL
        |    AND trip_distance_km IS NOT NULL
        |  GROUP BY 1
        |), lrs AS (
        |  SELECT vendor_code, n, sx, sy, sxx, syy, sxy,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |  FROM lragg)""".stripMargin,
      """SELECT vendor_code, n, round(slope, 12) AS slope,
        |  round((sy - slope * sx) / n, 12) AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |  ((n * sxx - sx * sx) * (n * syy - sy * sy)), 12) AS r2
        |FROM lrs ORDER BY vendor_code""".stripMargin),

    // same expression trees (association and all) as the Spark side; the
    // normalizer is m2 * sqrt(m2), never pow(m2, 1.5) — see the engine
    // comment
    "agg_skew_kurtosis" -> taxiWith(
      """ska AS (
        |  SELECT vendor_code, count(*) AS n,
        |    CAST(SUM(CAST(fare_amount AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(fare_amount * fare_amount AS DECIMAL(30,12))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(fare_amount * fare_amount * fare_amount
        |             AS DECIMAL(38,12))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(fare_amount * fare_amount * fare_amount * fare_amount
        |             AS DECIMAL(38,12))) AS DOUBLE) AS s4
        |  FROM deduped
        |  WHERE vendor_code IS NOT NULL AND fare_amount IS NOT NULL
        |  GROUP BY 1
        |), skm AS (
        |  SELECT *, s1 / n AS mean FROM ska
        |), skc AS (
        |  SELECT *,
        |    s2 / n - mean * mean AS m2,
        |    s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean AS m3,
        |    s4 / n - 4.0 * mean * (s3 / n) + 6.0 * mean * mean * (s2 / n)
        |      - 3.0 * mean * mean * mean * mean AS m4
        |  FROM skm)""".stripMargin,
      """SELECT vendor_code, n, round(mean, 12) AS mean_fare,
        |  round(m3 / (m2 * sqrt(m2)), 12) AS skewness,
        |  round(m4 / (m2 * m2) - 3.0, 12) AS kurtosis_excess
        |FROM skc ORDER BY vendor_code""".stripMargin),

    "win_gaps_islands" -> taxiWith(
      """gi_daily AS (
        |  SELECT vendor_code, ingest_date, count(*) AS n_trips
        |  FROM deduped WHERE vendor_code IS NOT NULL
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), gi_isl AS (
        |  SELECT *, CAST(ingest_date - DATE '1970-01-01' AS BIGINT)
        |      - row_number() OVER (PARTITION BY vendor_code
        |                           ORDER BY ingest_date) AS island
        |  FROM gi_daily)""".stripMargin,
      """SELECT vendor_code,
        |  CAST(min(ingest_date) AS VARCHAR) AS start_date,
        |  CAST(max(ingest_date) AS VARCHAR) AS end_date,
        |  count(*) AS n_days,
        |  CAST(sum(n_trips) AS BIGINT) AS n_trips
        |FROM gi_isl GROUP BY vendor_code, island
        |ORDER BY vendor_code, start_date""".stripMargin),

    "agg_distinct_sketch" -> taxiWith(
      """kmv AS (
        |  SELECT h FROM (
        |    SELECT DISTINCT abs(CASE WHEN u >= 9223372036854775808::UBIGINT
        |        THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
        |        ELSE CAST(u AS BIGINT) END) AS h
        |    FROM (SELECT ('0x' || substr(sha256(CAST(trip_src_id AS VARCHAR)), 1, 16))::UBIGINT AS u
        |          FROM deduped) y) z
        |  ORDER BY h LIMIT 256),
        |est AS (
        |  SELECT CASE WHEN (SELECT count(*) FROM kmv) < 256
        |    THEN (SELECT count(*) FROM kmv)::DOUBLE
        |    ELSE 255.0 * 9223372036854775808.0 / (SELECT max(h) FROM kmv)::DOUBLE
        |  END AS kmv_estimate)""".stripMargin,
      """SELECT e.kmv_estimate, x.exact,
        |  abs(e.kmv_estimate - x.exact) / x.exact AS rel_error
        |FROM est e CROSS JOIN
        |  (SELECT count(DISTINCT trip_src_id) AS exact FROM deduped) x""".stripMargin),

    // replays both sketches exactly (ORDER BY h LIMIT k over the same
    // sha256-prefix hashes), then applies the identical set-algebra
    "agg_sketch_setops" -> taxiWith(
      """ssh AS (
        |  SELECT trip_src_id, payment_type, fare_amount,
        |    abs(CASE WHEN u >= 9223372036854775808::UBIGINT
        |        THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
        |        ELSE CAST(u AS BIGINT) END) AS h
        |  FROM (SELECT trip_src_id, payment_type, fare_amount,
        |          ('0x' || substr(sha256(CAST(trip_src_id AS VARCHAR)), 1, 16))::UBIGINT AS u
        |        FROM deduped) y),
        |ska AS (SELECT h FROM (SELECT DISTINCT h FROM ssh
        |        WHERE payment_type = 'CARD') za ORDER BY h LIMIT 256),
        |skb AS (SELECT h FROM (SELECT DISTINCT h FROM ssh
        |        WHERE fare_amount > 20.0) zb ORDER BY h LIMIT 256),
        |skall AS (SELECT DISTINCT h FROM
        |        (SELECT h FROM ska UNION ALL SELECT h FROM skb) q),
        |sku AS (SELECT h FROM skall ORDER BY h LIMIT 256),
        |skc AS (SELECT
        |  (SELECT count(*) FROM ska) AS k_a,
        |  (SELECT count(*) FROM skb) AS k_b,
        |  (SELECT count(*) FROM skall) AS n_uall,
        |  (SELECT count(*) FROM sku) AS n_u,
        |  (SELECT max(h) FROM sku) AS h_k,
        |  (SELECT count(*) FROM sku WHERE h IN (SELECT h FROM ska)
        |     AND h IN (SELECT h FROM skb)) AS in_both,
        |  (SELECT count(DISTINCT trip_src_id) FROM ssh
        |     WHERE payment_type = 'CARD' OR fare_amount > 20.0) AS exact_union,
        |  (SELECT count(DISTINCT trip_src_id) FROM ssh
        |     WHERE payment_type = 'CARD' AND fare_amount > 20.0) AS exact_inter),
        |skf AS (SELECT *,
        |  CASE WHEN n_uall < 256 THEN n_uall::DOUBLE
        |       ELSE 255.0 * 9223372036854775808.0 / h_k::DOUBLE END AS est_union,
        |  in_both::DOUBLE / n_u AS jaccard_est FROM skc)""".stripMargin,
      """SELECT k_a, k_b, exact_union, est_union, exact_inter,
        |  jaccard_est * est_union AS est_inter, jaccard_est
        |FROM skf""".stripMargin),

    "agg_sketch_grouped" -> taxiWith(
      """vh AS (
        |  SELECT DISTINCT vendor_code,
        |    abs(CASE WHEN u >= 9223372036854775808::UBIGINT
        |        THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
        |        ELSE CAST(u AS BIGINT) END) AS h
        |  FROM (SELECT vendor_code,
        |          ('0x' || substr(sha256(CAST(trip_src_id AS VARCHAR)), 1, 16))::UBIGINT AS u
        |        FROM deduped WHERE vendor_code IS NOT NULL) y),
        |vk AS (
        |  SELECT vendor_code, count(*) AS cnt, max(h) AS mx FROM (
        |    SELECT vendor_code, h,
        |      row_number() OVER (PARTITION BY vendor_code ORDER BY h) AS rn
        |    FROM vh) r WHERE rn <= 64 GROUP BY vendor_code)""".stripMargin,
      """SELECT k.vendor_code,
        |  CASE WHEN k.cnt < 64 THEN k.cnt::DOUBLE
        |       ELSE 63.0 * 9223372036854775808.0 / k.mx::DOUBLE END AS kmv_estimate,
        |  x.exact
        |FROM vk k JOIN (
        |  SELECT vendor_code, count(DISTINCT trip_src_id) AS exact
        |  FROM deduped WHERE vendor_code IS NOT NULL GROUP BY vendor_code) x
        |  USING (vendor_code)
        |ORDER BY vendor_code""".stripMargin),

    "agg_count_distinct" -> taxi(
      """SELECT count(DISTINCT trip_id) AS distinct_trips, count(*) AS rows
        |FROM fact""".stripMargin),

    "agg_freshness" -> taxi(
      """SELECT last_loaded_at,
        |  date_diff('second', last_loaded_at, TIMESTAMP '2024-07-01 00:00:00') // 60
        |    AS minutes_behind
        |FROM (SELECT max(loaded_at) AS last_loaded_at FROM deduped) t""".stripMargin),

    "win_dedupe_rank" -> taxi(
      """SELECT trip_src_id, vendor_code, pickup_ts_utc, dropoff_ts_utc,
        |  trip_distance_km, fare_amount, payment_type, source_file_name
        |FROM deduped
        |ORDER BY trip_src_id, source_file_name, vendor_code NULLS FIRST,
        |  payment_type NULLS FIRST, fare_amount, trip_distance_km""".stripMargin),

    "win_global_rownum" -> taxi(
      """SELECT CAST(row_number() OVER (ORDER BY source_file_name, loaded_at, trip_src_id)
        |    AS BIGINT) AS rn, trip_src_id, source_file_name
        |FROM trips ORDER BY rn""".stripMargin),

    "win_join_pick" -> taxi(
      """SELECT trip_src_id, source_file_name FROM (
        |  SELECT trip_src_id, source_file_name,
        |    row_number() OVER (PARTITION BY trip_src_id
        |      ORDER BY loaded_at DESC, source_file_name DESC) AS rn
        |  FROM trips_dup) t
        |WHERE rn = 1 ORDER BY trip_src_id""".stripMargin),

    "sort_topn" -> taxi(
      """SELECT trip_src_id, loaded_at, fare_amount FROM deduped
        |ORDER BY loaded_at DESC, trip_src_id DESC, fare_amount DESC
        |LIMIT 50""".stripMargin),

    "setop_union_distinct" -> taxi(
      """SELECT DISTINCT location_id FROM (
        |  SELECT pu_location_id AS location_id FROM trips
        |  UNION ALL
        |  SELECT do_location_id FROM trips) u
        |WHERE location_id IS NOT NULL ORDER BY location_id""".stripMargin),

    "setop_intersect" -> taxi(
      """SELECT pu_location_id AS location_id FROM trips
        |WHERE pu_location_id IS NOT NULL
        |INTERSECT
        |SELECT do_location_id FROM trips WHERE do_location_id IS NOT NULL
        |ORDER BY location_id""".stripMargin),

    "setop_except" -> taxi(
      """SELECT pu_location_id AS location_id FROM trips
        |WHERE pu_location_id IS NOT NULL
        |EXCEPT
        |SELECT do_location_id FROM trips WHERE do_location_id IS NOT NULL
        |ORDER BY location_id""".stripMargin),

    "setop_except_all" -> taxi(
      """SELECT location_id, count(*) AS surplus FROM (
        |  SELECT pu_location_id AS location_id FROM trips
        |  WHERE pu_location_id IS NOT NULL
        |  EXCEPT ALL
        |  SELECT do_location_id FROM trips WHERE do_location_id IS NOT NULL)
        |GROUP BY location_id ORDER BY location_id""".stripMargin),

    "setop_intersect_all" -> taxi(
      """SELECT location_id, count(*) AS common_visits FROM (
        |  SELECT pu_location_id AS location_id FROM trips
        |  WHERE pu_location_id IS NOT NULL
        |  INTERSECT ALL
        |  SELECT do_location_id FROM trips WHERE do_location_id IS NOT NULL)
        |GROUP BY location_id ORDER BY location_id""".stripMargin),

    "setop_union_all" -> taxiWith(
      """agg AS (
        |  SELECT count(*) AS stg_rows,
        |    CAST(sum(CASE WHEN pickup_ts IS NOT NULL AND dropoff_ts IS NOT NULL
        |                   AND pickup_ts <= dropoff_ts AND fare_amount >= 0
        |                   AND trip_distance_mi >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS core_rows,
        |    CAST(sum(CASE WHEN fare_amount < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_fare,
        |    CAST(sum(CASE WHEN pickup_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS null_pickup
        |  FROM trips)""".stripMargin,
      """SELECT check_name, status FROM (
        |  SELECT 'rowcount_core_gt_0' AS check_name,
        |    CASE WHEN core_rows > 0 THEN 'PASSED' ELSE 'FAILED' END AS status FROM agg
        |  UNION ALL
        |  SELECT 'no_negative_fare',
        |    CASE WHEN neg_fare = 0 THEN 'PASSED' ELSE 'WARNING' END FROM agg
        |  UNION ALL
        |  SELECT 'no_null_pickup_ts',
        |    CASE WHEN null_pickup = 0 THEN 'PASSED' ELSE 'FAILED' END FROM agg
        |  UNION ALL
        |  SELECT 'core_le_stg',
        |    CASE WHEN core_rows <= stg_rows THEN 'PASSED' ELSE 'FAILED' END FROM agg) c
        |ORDER BY check_name""".stripMargin))
}
