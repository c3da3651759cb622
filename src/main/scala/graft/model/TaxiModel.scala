package graft.model

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.functions.TaxiFunctions._

/** The taxi-shaped data model over the driver's TPC-H-ish fixtures.
  *
  * FIXTURES.md §A maps `lineitem` → trip facts. This object pins ONE
  * deterministic `lineitem → trips` derivation, shared verbatim (in DuckDB
  * dialect) by [[graft.oracle.OracleCte]], so every downstream operator
  * (clean, route, dedupe, dims, fact, star view — SURVEY.md §2) is
  * oracle-checkable end-to-end.
  *
  * The derivation is seeded so that each reference DQ path is exercised:
  * blank vendor codes (trim→NULL), NULL pickup/dropoff timestamps, negative
  * fares/distances, pickup>dropoff, unmapped payment codes, duplicated
  * natural keys with differing lineage (dedupe winner-pick).
  */
object TaxiModel {

  /** Deterministic raw-trip view of `lineitem` (pre-clean, mirrors
    * `stg.trip`, ref: sql/batchELT/staging/stg_trip.sql:8-36). */
  def trips(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    val pickupMin = (col("l_orderkey") * 7919) % 1440
    val basePickup = timestamp_add("MINUTE", pickupMin, col("l_shipdate"))
    val baseDropoff = timestamp_add("MINUTE",
      pickupMin + col("l_linenumber") * 37 - 60, col("l_shipdate"))
    li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("trip_src_id"),
      when(col("l_partkey") % 101 === 0, lit("  "))
        .otherwise(concat(lit("v"), (col("l_suppkey") % 5).cast("string")))
        .as("vendor_raw"),
      when(col("l_orderkey") % 97 === 0, lit(null).cast("timestamp_ntz"))
        .otherwise(basePickup).as("pickup_ts"),
      when(col("l_orderkey") % 89 === 0, lit(null).cast("timestamp_ntz"))
        .otherwise(baseDropoff).as("dropoff_ts"),
      (col("l_extendedprice") / 1000 - 20).as("fare_amount"),
      (col("l_quantity") - 5).as("trip_distance_mi"),
      (col("l_tax") * col("l_extendedprice") / 100).as("tip_amount"),
      (col("l_discount") * 10).as("tolls_amount"),
      (col("l_extendedprice") / 900).as("total_amount"),
      when((col("l_orderkey") + col("l_linenumber")) % 11 === 0, lit("XX"))
        .when(col("l_returnflag") === "N" && col("l_linestatus") === "O", lit("1"))
        .when(col("l_returnflag") === "A", lit("2"))
        .when(col("l_returnflag") === "R", lit("3"))
        .when(col("l_linestatus") === "F", lit("CRD"))
        .otherwise(lit("4")).as("payment_src"),
      when(col("l_orderkey") % 53 === 0, lit(99))
        .otherwise((col("l_orderkey") % 6 + 1).cast("int")).as("rate_code"),
      when(col("l_linestatus") === "O", lit("N")).otherwise(lit("Y")).as("flag_raw"),
      (col("l_partkey") % 300).cast("int").as("pu_location_id"),
      (col("l_suppkey") % 300).cast("int").as("do_location_id"),
      col("l_shipdate").cast("date").as("ingest_date"),
      concat(lit("file_"), (col("l_orderkey") % 7).cast("string"), lit(".parquet"))
        .as("source_file_name"),
      timestamp_add("MINUTE", col("l_orderkey") % 1440,
        lit("2024-06-01 00:00:00").cast("timestamp_ntz")).as("loaded_at"))
  }

  /** `trips` plus replayed duplicates (same natural key, later lineage) —
    * the dedupe-winner fixture (ref dedupe idiom:
    * 12_trip_clean.dedupe_load.sql:9-17). */
  def tripsWithDups(spark: SparkSession, sfDir: String): DataFrame = {
    val t = trips(spark, sfDir)
    val replays = t.filter(col("trip_src_id") % 13 === 0)
      .withColumn("loaded_at", timestamp_add("MINUTE", lit(500), col("loaded_at")))
      .withColumn("source_file_name", lit("replay.parquet"))
    t.unionAll(replays)
  }

  /** Seeded `ref.payment_type_map`
    * (ref: sql/batchELT/ref/01_payment_type_map.sql:17-32). */
  def paymentTypeMap(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("1", "CARD", true), ("2", "CASH", true), ("3", "NO_CHARGE", true),
      ("4", "DISPUTE", true), ("CRD", "CARD", true), ("CSH", "CASH", true),
      ("5", "VOID", false) // inactive mapping: must NOT win the lookup
    ).toDF("payment_type_src", "payment_type_std", "is_active")
  }

  /** Domain predicate (ref WHERE clause, 11_trip_clean.slice_ctas.sql:51-55):
    * non-null pickup/dropoff, pickup <= dropoff, fare >= 0, distance >= 0. */
  def domainFilter: Column =
    col("pickup_ts").isNotNull && col("dropoff_ts").isNotNull &&
      col("pickup_ts") <= col("dropoff_ts") &&
      col("fare_amount") >= 0 && col("trip_distance_mi") >= 0

  /** First-match reject reason (ref: err/21_err_trip.capture.sql:4-24 +
    * the richer embedded Quarantine_Rejected variant). */
  def rejectReason: Column =
    when(col("pickup_ts").isNull || col("dropoff_ts").isNull, "NULL_TIME")
      .when(col("fare_amount") < 0, "NEGATIVE_FARE")
      .when(col("trip_distance_mi") < 0, "NEGATIVE_DISTANCE")
      .when(col("pickup_ts") > col("dropoff_ts"), "PICKUP_AFTER_DROPOFF")
      .otherwise("OTHER_BAD_VALUES")

  /** The cleaned-trip projection (`core.trip_clean` slice CTAS semantics,
    * ref: 11_trip_clean.slice_ctas.sql:14-55): safe typing, trim/NULL
    * normalization, miles→km, payment canonicalization via broadcast
    * lookup with inline-CASE fallback, night flag, domain filter. */
  def cleaned(raw: DataFrame, paymentMap: DataFrame): DataFrame = {
    val pm = paymentMap.filter(col("is_active"))
      .select(col("payment_type_src"), col("payment_type_std"))
    raw.filter(domainFilter)
      .join(broadcast(pm), trim(col("payment_src")) === col("payment_type_src"), "left")
      .select(
        col("trip_src_id"),
        cleanTrimNull(col("vendor_raw")).as("vendor_code"),
        col("pickup_ts").as("pickup_ts_utc"),
        col("dropoff_ts").as("dropoff_ts_utc"),
        milesToKm(col("trip_distance_mi")).as("trip_distance_km"),
        col("fare_amount"),
        truncateTo(coalesce(col("payment_type_std"),
          paymentCanonCase(trim(col("payment_src")))), 16).as("payment_type"),
        nightFlag(col("pickup_ts")).as("is_night_ride"),
        col("rate_code"), col("flag_raw"),
        col("pu_location_id"), col("do_location_id"),
        col("tip_amount"), col("tolls_amount"), col("total_amount"),
        col("ingest_date"), col("source_file_name"), col("loaded_at"))
  }

  /** Natural-key columns used for dedupe (embedded LoadCore_DedupeAndMetrics
    * variant in pl_stg_to_core_nyctaxi.json). */
  val naturalKey: Seq[String] = Seq(
    "vendor_code", "pickup_ts_utc", "dropoff_ts_utc",
    "trip_distance_km", "fare_amount", "payment_type")

  /** Deterministic winner-pick dedupe: ROW_NUMBER over the natural key,
    * latest `loaded_at` / `source_file_name` wins (ref idiom), with
    * `trip_src_id` as the final tie-break — already a *total* order within
    * groups (ids are unique per source row; replays differ in
    * loaded_at/file), so the winner is engine-independent while the sort
    * state stays narrow. */
  def deduped(clean: DataFrame): DataFrame = {
    // Winner-pick via ROW_NUMBER()=1 (optimization round 19, measured):
    // the former max(struct(sort keys ++ payload)) aggregate looked like a
    // map-side-combining hash aggregate but a struct buffer is not
    // mutable-buffer-typed, so it planned as SortAggregate on BOTH sides
    // of the exchange — a full sort of every wide row twice. The window
    // path sorts once per side too, but Spark 4's partial
    // WindowGroupLimit prunes each map partition to rank-1 rows BEFORE
    // the exchange, so the shuffle carries pre-reduced groups. Identical
    // winner: (loaded_at, source_file_name, trip_src_id) DESC is a total
    // order within groups (trip_src_id unique per source row) — exactly
    // the ordering the struct comparison encoded.
    val cols = clean.columns
    val w = Window.partitionBy(naturalKey.map(col): _*)
      .orderBy(col("loaded_at").desc, col("source_file_name").desc,
        col("trip_src_id").desc)
    clean.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(cols.map(col).toSeq: _*)
  }

  /** SHA-256 degenerate key over the canonicalized natural key
    * (ref: 40_fact_trip.load.sql:70-79). */
  def tripId: Column = sha256TripId(
    col("vendor_code"), col("pickup_ts_utc"), col("dropoff_ts_utc"),
    col("fare_amount"), col("trip_distance_km"), col("payment_type"))
}
