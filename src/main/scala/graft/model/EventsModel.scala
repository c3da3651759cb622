package graft.model

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.stream.StreamTransforms

/** The stream-event view of the driver's `events` fixture (FIXTURES.md §A:
  * events → streaming lane).
  *
  * Mirrors the reference's producer event shape
  * (tools/streaming/producer/send.py:13-25): each fixture row becomes a
  * JSON envelope whose keys are camelCase for even event_ids and snake_case
  * for odd ones — the dual-naming tolerance the ASA query handles via
  * `GetRecordPropertyValue` pairs (infra/scripts/asa-wire.sh:156-196).
  *
  * The derivation is deterministic and seeded so every streaming DQ path is
  * hit: null pickup/dropoff (missing_required), negative fare/distance
  * (negative_values), negative and >480min durations (bad_duration),
  * unmapped payment codes, and cross-hour replays (late-data idempotence).
  *
  * [[graft.oracle.StreamOracle]] carries the same derivation in DuckDB
  * dialect — it computes the *typed result* directly (no JSON round trip),
  * so the declared queries prove Spark's envelope-build → `from_json` →
  * dual-key-coalesce path lands on exactly the oracle's values.
  */
object EventsModel {

  /** Typed pre-envelope event fields (what the producer knows).
    *
    * The fixture is one single-row-group parquet file, so the scan is one
    * task no matter what maxPartitionBytes says — and everything derived
    * here (to_json envelope build, from_json parse, DQ routing) would run
    * single-threaded on a 32-core session. One hash repartition on
    * event_id (deterministic row→partition mapping) spreads the synthetic
    * producer derivation across the pool; it costs a shuffle of the tiny
    * raw scan only, and only on this fixture-synthesis lane — the
    * production ingest path ([[graft.stream.Ingest]]) reads many landing
    * files and parallelizes at the source. The partition count is pinned
    * (REPARTITION_BY_NUM) because the shuffled bytes are tiny and AQE
    * would coalesce the exchange back to one partition — the point is
    * spreading downstream CPU, not balancing shuffle bytes. */
  def rawEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev0 = Tables(spark, sfDir, "events")
    val ev = ev0.repartition(
      ev0.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt,
      col("event_id"))
    // ts physical type varies by fixture generation (nanos-as-long vs
    // micros-timestamp) — Tables.eventTsNtz dispatches on the read schema.
    val arrival = Tables.eventTsNtz(ev)
    val durS = when(col("event_id") % 37 === 0, lit(-300))
      .when(col("event_id") % 41 === 0, lit(30000))
      .otherwise((col("event_id") * 7919) % 3000 + 60)
    ev.select(
      col("event_id"),
      arrival.as("arrival_ts"),
      when(col("event_id") % 23 === 0, lit(null).cast("timestamp_ntz"))
        .otherwise(timestamp_add("SECOND", -durS, arrival)).as("pickup_ts"),
      when(col("event_id") % 29 === 0, lit(null).cast("timestamp_ntz"))
        .otherwise(arrival).as("dropoff_ts"),
      concat(lit("v"), (col("user_id") % 5).cast("string")).as("vendor_id"),
      get_json_object(col("props"), "$.k").cast("long").as("passenger_count"),
      (col("value") / 20 - when(col("event_id") % 43 === 0, 30).otherwise(0))
        .as("trip_distance"),
      (col("value") - when(col("event_id") % 31 === 0, 500).otherwise(0))
        .as("fare_amount"),
      (col("value") / 10).as("tip_amount"),
      col("value").as("total_amount"),
      when(col("user_id") % 4 === 0, "CRD").when(col("user_id") % 4 === 1, "CSH")
        .when(col("user_id") % 4 === 2, "1").otherwise("ZZ").as("payment_type"))
  }

  private def isoMicros(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** The JSON wire envelope: one `json` line per event + arrival metadata
    * (what a file/Kafka source would deliver). Even event_ids use camelCase
    * keys, odd use snake_case. */
  def envelopes(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = rawEvents(spark, sfDir)
    val camel = to_json(struct(
      col("event_id"),
      col("vendor_id").as("vendorId"),
      isoMicros(col("pickup_ts")).as("tpepPickupDatetime"),
      isoMicros(col("dropoff_ts")).as("tpepDropoffDatetime"),
      col("passenger_count"), col("trip_distance"), col("fare_amount"),
      col("tip_amount"), col("total_amount"),
      col("payment_type").as("paymentType"),
      isoMicros(col("arrival_ts")).as("producer_ts")))
    val snake = to_json(struct(
      col("event_id"), col("vendor_id"),
      isoMicros(col("pickup_ts")).as("pickup_datetime"),
      isoMicros(col("dropoff_ts")).as("dropoff_datetime"),
      col("passenger_count"), col("trip_distance"), col("fare_amount"),
      col("tip_amount"), col("total_amount"), col("payment_type"),
      isoMicros(col("arrival_ts")).as("producer_ts")))
    raw.select(
      when(col("event_id") % 2 === 0, camel).otherwise(snake).as("json"),
      col("arrival_ts"))
  }

  /** Envelope stream parsed back to typed columns (dual-key tolerant). */
  def parsed(spark: SparkSession, sfDir: String): DataFrame =
    StreamTransforms.parse(envelopes(spark, sfDir))

  /** Parsed + enriched (durationMin, DQ flags, route, hour path). */
  def routed(spark: SparkSession, sfDir: String): DataFrame =
    StreamTransforms.route(StreamTransforms.enrich(parsed(spark, sfDir)))

  /** Replay fixture: curated events of `hour` re-delivered one hour later
    * (same payload → same deterministic trip id), late-data absorption. */
  def withReplays(df: DataFrame): DataFrame = {
    val replays = df.filter(col("event_id") % 13 === 0)
      .withColumn("arrival_ts", timestamp_add("HOUR", lit(1), col("arrival_ts")))
    df.unionByName(replays)
  }
}
