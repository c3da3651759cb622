package graft.stream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TaxiFunctions._

/** Stateless streaming-lane transforms — SURVEY.md §2.8.
  *
  * Pure `DataFrame → DataFrame` column programs: the same functions run on
  * a static frame (declared oracle queries) and on a Structured Streaming
  * frame ([[Ingest]]) — stateless `select`/`withColumn` are the operators
  * Spark allows on both. Re-expresses the ASA job's parsed/enriched CTEs
  * and 3-way routed sinks (infra/scripts/asa-wire.sh:156-247).
  */
object StreamTransforms {

  /** Wire schema: BOTH key conventions, everything nullable (permissive). */
  val wireSchema: String =
    "event_id BIGINT, vendorId STRING, vendor_id STRING, " +
      "tpepPickupDatetime STRING, pickup_datetime STRING, " +
      "tpepDropoffDatetime STRING, dropoff_datetime STRING, " +
      "passenger_count BIGINT, trip_distance DOUBLE, fare_amount DOUBLE, " +
      "tip_amount DOUBLE, total_amount DOUBLE, " +
      "paymentType STRING, payment_type STRING, producer_ts STRING"

  /** `dual_key_coalesce` (ref: asa-wire.sh:156-196): permissive
    * `from_json`, then per-field COALESCE over camelCase/snake_case, CAST
    * to the staging type. Expects a `json` column; every other input
    * column (arrival metadata) is carried through. */
  def parse(envelopes: DataFrame): DataFrame = {
    val e = envelopes.withColumn("_p",
      from_json(col("json"), org.apache.spark.sql.types.StructType.fromDDL(wireSchema)))
    e.select(
      col("_p.event_id").as("event_id"),
      coalesce(col("_p.vendorId"), col("_p.vendor_id")).as("vendor_id"),
      coalesce(col("_p.tpepPickupDatetime"), col("_p.pickup_datetime"))
        .cast("timestamp_ntz").as("pickup_ts"),
      coalesce(col("_p.tpepDropoffDatetime"), col("_p.dropoff_datetime"))
        .cast("timestamp_ntz").as("dropoff_ts"),
      col("_p.passenger_count").as("passenger_count"),
      col("_p.trip_distance").as("trip_distance"),
      col("_p.fare_amount").as("fare_amount"),
      col("_p.tip_amount").as("tip_amount"),
      col("_p.total_amount").as("total_amount"),
      coalesce(col("_p.paymentType"), col("_p.payment_type")).as("payment_type"),
      col("_p.producer_ts").cast("timestamp_ntz").as("producer_ts"),
      col("arrival_ts"),
      col("json")) // raw wire line carried for the passthrough/DLQ sinks
  }

  /** Unknown-key capture for wire drift (VERDICT r18 #4): the JSON
    * object of every key the declared [[wireSchema]] does NOT know, as a
    * string column (NULL when the envelope carries nothing unknown) —
    * values stringified, because an unplanned wire key has no declared
    * type and STRING is the only honest landing. One extra generic parse
    * per row, so this rides the INGEST lane only ([[parseWithExtras]]);
    * the batch-declared queries keep [[parse]]'s single-parse shape. */
  def extrasOf(json: Column): Column = {
    val known = org.apache.spark.sql.types.StructType.fromDDL(wireSchema)
      .fieldNames.toSeq
    val m = from_json(json, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType))
    val unknown = map_filter(m, (k, _) => !k.isInCollection(known))
    when(unknown.isNotNull && size(map_keys(unknown)) > 0, to_json(unknown))
  }

  /** [[parse]] + the `_extras` wire-drift column — the ingest hot path's
    * parse, so a NEW key appearing mid-stream flows into the curated lake
    * (and from there additively into staging and the star) with no
    * operator step. */
  def parseWithExtras(envelopes: DataFrame): DataFrame =
    parse(envelopes).withColumn("_extras", extrasOf(col("json")))

  /** `stream_dq_flags` + `f_duration_min` (ref: asa-wire.sh:199-211):
    * per-event enrichment — duration in minutes (T-SQL boundary-crossing
    * semantics) and the three DQ flags. */
  def enrich(parsed: DataFrame): DataFrame = parsed
    .withColumn("duration_min", durationMin(col("pickup_ts"), col("dropoff_ts")))
    .withColumn("flag_missing_required",
      col("pickup_ts").isNull || col("dropoff_ts").isNull)
    .withColumn("flag_negative_values",
      col("trip_distance") < 0 || col("fare_amount") < 0 || col("total_amount") < 0)
    .withColumn("flag_bad_duration",
      col("duration_min") < 0 || col("duration_min") > 480)

  /** First-match DLQ reason (priority: missing > negative > duration,
    * ref: asa-wire.sh:235-240). NULL for clean events. */
  def dlqReason: Column =
    when(col("flag_missing_required"), "missing_required")
      .when(col("flag_negative_values"), "negative_values")
      .when(col("flag_bad_duration"), "bad_duration")

  /** `stream_route` (ref: asa-wire.sh:213-244): 'curated' | 'dlq' routing
    * + hourly partition path `date=yyyy/MM/dd/HH` on arrival time (the raw
    * sink is an unconditional passthrough of the same stream). */
  def route(enriched: DataFrame): DataFrame = enriched
    .withColumn("reason", dlqReason)
    .withColumn("sink", when(col("reason").isNotNull, "dlq").otherwise("curated"))
    .withColumn("hour_path",
      concat(lit("date="), date_format(col("arrival_ts"), "yyyy/MM/dd/HH")))

  /** Streaming surrogate trip id (ref:
    * usp_upsert_trips_from_streaming.sql:14-16,24): signed-positive first
    * 8 bytes of SHA-256 over `eventId|pickupISO|dropoffISO`. */
  def streamTripId: Column = hash64Id(concat_ws("|",
    col("event_id").cast("string"),
    coalesce(isoFormat(col("pickup_ts")), lit("")),
    coalesce(isoFormat(col("dropoff_ts")), lit(""))))

  /** `slice_rebuild` + `win_dedupe_stream` (ref:
    * usp_upsert_trips_from_streaming.sql:7-59): run-scoped slice for one
    * hour of curated events — deterministic trip id, lineage, winner-pick
    * dedupe by id (latest producer_ts, then arrival). */
  def buildSlice(routed: DataFrame, runId: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val curated = routed.filter(col("sink") === "curated")
      .withColumn("trip_id", streamTripId)
      .withColumn("_runId", runId)
      .withColumn("_blobPath",
        concat(col("hour_path"), lit("/part-"), (col("event_id") % 3).cast("string"),
          lit(".csv")))
      .withColumn("_ingestedAt", col("arrival_ts"))
    // Winner-pick via ROW_NUMBER()=1, MEASURED faster than the former
    // max(struct(all columns)) here (optimization round 19): a struct
    // aggregation buffer is not mutable-buffer-typed, so the "hash"
    // aggregate actually planned as SortAggregate on BOTH sides of the
    // exchange — full sorts of every wide row (incl. the raw `json` wire
    // string). The window path sorts too, but Spark 4's partial
    // WindowGroupLimit prunes each map partition to rank-1 rows BEFORE
    // the exchange, so the shuffle carries pre-reduced groups (6.1 s ->
    // 1.8 s for the slice build at sf0.1 local[8]). Winner identical:
    // (producer_ts, arrival_ts, event_id) DESC with unique event_id is a
    // total order, the exact ordering max(struct) encoded.
    val cols = curated.columns
    val w = Window.partitionBy(col("trip_id"))
      .orderBy(col("producer_ts").desc, col("arrival_ts").desc,
        col("event_id").desc)
    curated.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(cols.map(col).toSeq: _*)
  }

  /** `merge_upsert_key` for the stream (Synapse-safe update-then-insert,
    * ref README.md "Key design choices"): full-outer on trip_id; returns
    * the merged frame with a `merge_action` column so callers can derive
    * (inserted, updated, total) — the counts contract of
    * usp_upsert_fact_trip_streaming (SURVEY §3.3 divergence note).
    *
    * Row existence comes from explicit per-side markers (never from a
    * value column's nullness), and a matched row takes EVERY column from
    * the source — the reference's UPDATE-all-columns semantics
    * (usp_upsert_trip_clean_from_slice_streaming.sql:37-44): a NULL in a
    * re-delivered source row overwrites the target value. */
  def mergeByTripId(target: DataFrame, staged: DataFrame,
                    valueCols: Seq[String]): DataFrame = {
    val s = staged.select(Seq(col("trip_id"), lit(true).as("_s_exists")) ++
      valueCols.map(c => col(c).as(s"s_$c")): _*)
    val t = target.select(Seq(col("trip_id"), lit(true).as("_t_exists")) ++
      valueCols.map(c => col(c).as(s"t_$c")): _*)
    val merged = s.join(t, Seq("trip_id"), "full_outer")
    val sEx = col("_s_exists").isNotNull
    val tEx = col("_t_exists").isNotNull
    val out = valueCols.map(c => when(sEx, col(s"s_$c")).otherwise(col(s"t_$c")).as(c))
    merged.select((Seq(col("trip_id")) ++ out :+
      when(sEx && tEx, "updated").when(sEx, "inserted")
        .otherwise("unchanged").as("merge_action")): _*)
  }
}
