package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library — SURVEY.md §2.3.
  *
  * Each combinator re-expresses one scalar op observed in the reference
  * (`neelamsk/azure-nyctaxi-lambda-elt`) as a codegen-friendly Spark
  * `Column` expression. No UDFs: every function below composes built-in
  * `org.apache.spark.sql.functions` so it stays inside whole-stage codegen.
  *
  * Determinism note: these are also used by the DuckDB-oracle-checked
  * queries in [[graft.SparkEntry]]; formatting/rounding choices (printf-style
  * rendering, HALF_UP rounding on the exact binary value of doubles) are
  * identical in both engines.
  */
object TaxiFunctions {

  /** miles → km: `ROUND(x * 1.609344, 3)`
    * (ref: sql/batchELT 11_trip_clean.slice_ctas.sql:22-25) */
  def milesToKm(mi: Column): Column = round(mi * lit(1.609344), 3)

  /** `UPPER(NULLIF(LTRIM(RTRIM(x)),''))` — trim, blank→NULL, uppercase
    * (ref: 11_trip_clean.slice_ctas.sql:16) */
  def cleanTrimNull(c: Column): Column = upper(nullif(trim(c), lit("")))

  /** Inline payment canonicalization fallback CASE
    * (ref: 11_trip_clean.slice_ctas.sql:29-35). Used as the fallback arm
    * behind the `ref.payment_type_map` broadcast lookup join. */
  def paymentCanonCase(src: Column): Column =
    when(src === "1", "CARD")
      .when(src === "2", "CASH")
      .when(src === "3", "NO_CHARGE")
      .when(src === "4", "DISPUTE")

  /** `is_night_ride`: pickup hour ∈ [22,23] ∪ [0,5] → 1 else 0
    * (ref: 11_trip_clean.slice_ctas.sql:37-42; the streaming lane's [20,5]
    * variant is normalized to [22,5] per SURVEY §7.4 decision 6). */
  def nightFlag(pickupTs: Column): Column =
    when(hour(pickupTs) >= 22 || hour(pickupTs) <= 5, 1).otherwise(0)

  /** Smart date key `YYYY*10000+MM*100+DD` (ref: 40_fact_trip.load.sql:81) */
  def dateKey(ts: Column): Column =
    (year(ts) * 10000 + month(ts) * 100 + dayofmonth(ts)).cast("int")

  /** Seconds-of-day key `hh*3600+mm*60+ss` (ref: 40_fact_trip.load.sql:82-84) */
  def timeKey(ts: Column): Column =
    (hour(ts) * 3600 + minute(ts) * 60 + second(ts)).cast("int")

  /** `DATEDIFF(minute, pickup, dropoff)` with T-SQL semantics — counts
    * minute-*boundary* crossings, not elapsed 60s intervals
    * (ref: asa-wire.sh:202; SURVEY §7.4 decision 7). Implemented by
    * truncating both ends to the minute, then diffing. */
  def durationMin(pickup: Column, dropoff: Column): Column =
    ((date_trunc("minute", dropoff).cast("timestamp").cast("long") -
      date_trunc("minute", pickup).cast("timestamp").cast("long")) / 60).cast("long")

  /** ISO-8601 render with milliseconds, `CONVERT(VARCHAR(23), ts, 126)`
    * (ref: 40_fact_trip.load.sql:73-74) */
  def isoFormat(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS")

  /** Fixed-scale decimal rendering for hash canonicalization — the T-SQL
    * `CAST(x AS DECIMAL(18,s))` render (always prints `s` fractional
    * digits).
    *
    * Cross-engine determinism: pick `scale` ≥ the number of exact decimal
    * digits the value can carry, so the render never has to *round* —
    * rounding is where engines disagree (Java formats HALF_UP on the exact
    * binary expansion; C printf rounds half-even; DuckDB's double→DECIMAL
    * cast multiplies-then-rounds, which can flip near-`.xx5` values the
    * other way). The reference's money values are exact at scale 2; the
    * fixture-derived fares are exact at scale ≤6, hence scale 6 at the
    * call sites here. */
  def decimalRender(c: Column, scale: Int): Column =
    format_string(s"%.${scale}f", c)

  /** Deterministic SHA-256 degenerate trip key
    * (ref: 40_fact_trip.load.sql:70-79): pipe-delimited canonical string of
    * (vendor, pickup_iso, dropoff_iso, fare %.2f, km %.3f, payment),
    * NULLs rendered as ''. Returns 64-char lowercase hex. */
  def sha256TripId(vendor: Column, pickup: Column, dropoff: Column,
                   fare: Column, km: Column, payment: Column): Column =
    sha2(concat_ws("|",
      coalesce(vendor, lit("")),
      coalesce(isoFormat(pickup), lit("")),
      coalesce(isoFormat(dropoff), lit("")),
      coalesce(decimalRender(fare, 6), lit("")),
      coalesce(decimalRender(km, 6), lit("")),
      coalesce(payment, lit(""))), 256)

  /** Streaming surrogate id (ref: usp_upsert_trips_from_streaming.sql:14-16):
    * `ABS(CONVERT(BIGINT, SUBSTRING(HASHBYTES('SHA2_256', nk),1,8)))` —
    * first 8 bytes of SHA-256, big-endian *signed*, then ABS.
    * Custom Catalyst expression with codegen ([[Sha256Prefix64]]) because
    * `conv(substring(sha2(..),1,16),16,10)` parses unsigned and cannot
    * reproduce the signed interpretation (SURVEY §7.3). */
  def hash64Id(nk: Column): Column = Sha256Prefix64.hash64(nk)

  /** Blob path → file name (ref: usp_upsert_trips_from_streaming.sql:36-39) */
  def basename(path: Column): Column = substring_index(path, "/", -1)

  /** Length coercion to target DDL, `LEFT(x, n)`
    * (ref: usp_upsert_trip_clean_from_slice_streaming.sql:20,23) */
  def truncateTo(c: Column, n: Int): Column = substring(c, 1, n)

  /** `CASE WHEN b > 0 THEN a/b END` guarded ratio
    * (ref: vw_fact_trip_bi.view.sql:35-40) */
  def safeDivide(a: Column, b: Column): Column = when(b > 0, a / b)

  /** `SUM(x)/NULLIF(SUM(y),0)` aggregate-ratio guard
    * (ref: docs/README_modeling.md §7) */
  def ratioOrNull(num: Column, den: Column): Column = num / nullif(den, lit(0))

  /** `CAST(ISNULL(ts, SYSUTCDATETIME()) AS DATE)`
    * (ref: usp_upsert_trips_from_streaming.sql:35) */
  def toIngestDate(ts: Column): Column =
    to_date(coalesce(ts, current_timestamp()))

  /** Debug payload stitch `CONCAT('k=', COALESCE(cast,'NULL'), '; ', ...)`
    * (ref: Quarantine_Rejected in pl_stg_to_core_nyctaxi.json) */
  def concatPayload(fields: (String, Column)*): Column =
    concat_ws("; ", fields.map { case (name, c) =>
      concat(lit(s"$name="), coalesce(c.cast("string"), lit("NULL")))
    }: _*)
}
