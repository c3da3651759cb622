package graft.oracle

/** DuckDB-dialect CTE mirror of [[graft.model.TaxiModel]].
  *
  * Every declared query in [[graft.SparkEntry]] ships `oracleSql` that the
  * driver runs in DuckDB over the same parquet tables. The taxi-shaped
  * queries share the deterministic `lineitem → trips` derivation — the SQL
  * here MUST stay semantically identical to the Spark DSL in `TaxiModel`
  * (same expression trees, same double-arithmetic order, same rounding and
  * printf rendering), or the driver's hash compare fails.
  */
object OracleCte {

  val trips: String =
    """trips AS (
      |  SELECT
      |    l_orderkey * 10 + l_linenumber AS trip_src_id,
      |    CASE WHEN l_partkey % 101 = 0 THEN '  '
      |         ELSE 'v' || CAST(l_suppkey % 5 AS VARCHAR) END AS vendor_raw,
      |    CASE WHEN l_orderkey % 97 = 0 THEN NULL
      |         ELSE l_shipdate + to_minutes((l_orderkey * 7919) % 1440) END AS pickup_ts,
      |    CASE WHEN l_orderkey % 89 = 0 THEN NULL
      |         ELSE l_shipdate + to_minutes((l_orderkey * 7919) % 1440 + l_linenumber * 37 - 60) END AS dropoff_ts,
      |    l_extendedprice / 1000 - 20 AS fare_amount,
      |    l_quantity - 5 AS trip_distance_mi,
      |    l_tax * l_extendedprice / 100 AS tip_amount,
      |    l_discount * 10 AS tolls_amount,
      |    l_extendedprice / 900 AS total_amount,
      |    CASE WHEN (l_orderkey + l_linenumber) % 11 = 0 THEN 'XX'
      |         WHEN l_returnflag = 'N' AND l_linestatus = 'O' THEN '1'
      |         WHEN l_returnflag = 'A' THEN '2'
      |         WHEN l_returnflag = 'R' THEN '3'
      |         WHEN l_linestatus = 'F' THEN 'CRD'
      |         ELSE '4' END AS payment_src,
      |    CASE WHEN l_orderkey % 53 = 0 THEN 99
      |         ELSE CAST(l_orderkey % 6 + 1 AS INT) END AS rate_code,
      |    CASE WHEN l_linestatus = 'O' THEN 'N' ELSE 'Y' END AS flag_raw,
      |    CAST(l_partkey % 300 AS INT) AS pu_location_id,
      |    CAST(l_suppkey % 300 AS INT) AS do_location_id,
      |    CAST(l_shipdate AS DATE) AS ingest_date,
      |    'file_' || CAST(l_orderkey % 7 AS VARCHAR) || '.parquet' AS source_file_name,
      |    TIMESTAMP '2024-06-01 00:00:00' + to_minutes(l_orderkey % 1440) AS loaded_at
      |  FROM lineitem
      |)""".stripMargin

  val tripsDup: String =
    """trips_dup AS (
      |  SELECT * FROM trips
      |  UNION ALL
      |  SELECT trip_src_id, vendor_raw, pickup_ts, dropoff_ts, fare_amount,
      |         trip_distance_mi, tip_amount, tolls_amount, total_amount,
      |         payment_src, rate_code, flag_raw, pu_location_id, do_location_id,
      |         ingest_date, 'replay.parquet' AS source_file_name,
      |         loaded_at + to_minutes(500) AS loaded_at
      |  FROM trips WHERE trip_src_id % 13 = 0
      |)""".stripMargin

  val paymentMap: String =
    """payment_map AS (
      |  SELECT * FROM (VALUES
      |    ('1','CARD',true),('2','CASH',true),('3','NO_CHARGE',true),
      |    ('4','DISPUTE',true),('CRD','CARD',true),('CSH','CASH',true),
      |    ('5','VOID',false)) AS pm(payment_type_src, payment_type_std, is_active)
      |)""".stripMargin

  val cleaned: String =
    """cleaned AS (
      |  SELECT
      |    t.trip_src_id,
      |    upper(nullif(trim(t.vendor_raw), '')) AS vendor_code,
      |    t.pickup_ts AS pickup_ts_utc,
      |    t.dropoff_ts AS dropoff_ts_utc,
      |    round(t.trip_distance_mi * 1.609344, 3) AS trip_distance_km,
      |    t.fare_amount,
      |    left(coalesce(pm.payment_type_std,
      |      CASE trim(t.payment_src) WHEN '1' THEN 'CARD' WHEN '2' THEN 'CASH'
      |        WHEN '3' THEN 'NO_CHARGE' WHEN '4' THEN 'DISPUTE' END), 16) AS payment_type,
      |    CASE WHEN hour(t.pickup_ts) >= 22 OR hour(t.pickup_ts) <= 5
      |         THEN 1 ELSE 0 END AS is_night_ride,
      |    t.rate_code, t.flag_raw, t.pu_location_id, t.do_location_id,
      |    t.tip_amount, t.tolls_amount, t.total_amount,
      |    t.ingest_date, t.source_file_name, t.loaded_at
      |  FROM trips_dup t
      |  LEFT JOIN (SELECT payment_type_src, payment_type_std
      |             FROM payment_map WHERE is_active) pm
      |    ON trim(t.payment_src) = pm.payment_type_src
      |  WHERE t.pickup_ts IS NOT NULL AND t.dropoff_ts IS NOT NULL
      |    AND t.pickup_ts <= t.dropoff_ts
      |    AND t.fare_amount >= 0 AND t.trip_distance_mi >= 0
      |)""".stripMargin

  val deduped: String =
    """deduped AS (
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT c.*, row_number() OVER (
      |      PARTITION BY vendor_code, pickup_ts_utc, dropoff_ts_utc,
      |                   trip_distance_km, fare_amount, payment_type
      |      ORDER BY loaded_at DESC, source_file_name DESC, trip_src_id DESC) AS rn
      |    FROM cleaned c) sub WHERE rn = 1
      |)""".stripMargin

  /** Deterministic dims: SK = row_number over NK order (IDENTITY analog,
    * SURVEY §7.4 decision 4). */
  val dims: String =
    """dim_vendor AS (
      |  SELECT vendor_code AS vendor_nk,
      |         CAST(row_number() OVER (ORDER BY vendor_code) AS INT) AS vendor_sk
      |  FROM (SELECT DISTINCT vendor_code FROM deduped WHERE vendor_code IS NOT NULL) v
      |), dim_payment AS (
      |  SELECT payment_type AS payment_nk,
      |         CAST(row_number() OVER (ORDER BY payment_type) AS INT) AS payment_sk
      |  FROM (SELECT DISTINCT payment_type FROM deduped WHERE payment_type IS NOT NULL) p
      |), dim_rate AS (
      |  SELECT rate_code AS rate_nk,
      |         CAST(row_number() OVER (ORDER BY rate_code) AS INT) AS rate_sk
      |  FROM (SELECT DISTINCT rate_code FROM deduped WHERE rate_code IS NOT NULL) r
      |), dim_flag AS (
      |  SELECT flag_raw AS flag_nk,
      |         CAST(row_number() OVER (ORDER BY flag_raw) AS INT) AS flag_sk
      |  FROM (SELECT DISTINCT flag_raw FROM deduped WHERE flag_raw IS NOT NULL) f
      |), dim_location AS (
      |  SELECT loc_nk,
      |         CAST(row_number() OVER (ORDER BY loc_nk) AS INT) AS loc_sk
      |  FROM (SELECT pu_location_id AS loc_nk FROM deduped
      |        UNION
      |        SELECT do_location_id FROM deduped) l
      |  WHERE loc_nk IS NOT NULL
      |)""".stripMargin

  /** Fact load: SHA-256 degenerate key + smart date/time keys + NK→SK
    * resolution with -1 unknown fallback (ref: 40_fact_trip.load.sql). */
  val fact: String =
    """fact AS (
      |  SELECT
      |    sha256(concat_ws('|',
      |      coalesce(d.vendor_code, ''),
      |      coalesce(strftime(d.pickup_ts_utc, '%Y-%m-%dT%H:%M:%S.%g'), ''),
      |      coalesce(strftime(d.dropoff_ts_utc, '%Y-%m-%dT%H:%M:%S.%g'), ''),
      |      coalesce(printf('%.6f', d.fare_amount), ''),
      |      coalesce(printf('%.6f', d.trip_distance_km), ''),
      |      coalesce(d.payment_type, ''))) AS trip_id,
      |    CAST(year(d.pickup_ts_utc) * 10000 + month(d.pickup_ts_utc) * 100
      |         + day(d.pickup_ts_utc) AS INT) AS pickup_date_key,
      |    CAST(hour(d.pickup_ts_utc) * 3600 + minute(d.pickup_ts_utc) * 60
      |         + second(d.pickup_ts_utc) AS INT) AS pickup_time_key,
      |    coalesce(dv.vendor_sk, -1) AS vendor_sk,
      |    coalesce(dp.payment_sk, -1) AS payment_sk,
      |    coalesce(dr.rate_sk, -1) AS rate_sk,
      |    coalesce(df.flag_sk, -1) AS flag_sk,
      |    coalesce(pu.loc_sk, -1) AS pu_location_sk,
      |    coalesce(dol.loc_sk, -1) AS do_location_sk,
      |    d.trip_distance_km, d.fare_amount, d.tip_amount, d.tolls_amount,
      |    d.total_amount, d.is_night_ride,
      |    d.ingest_date, d.source_file_name, d.loaded_at
      |  FROM deduped d
      |  LEFT JOIN dim_vendor dv ON d.vendor_code = dv.vendor_nk
      |  LEFT JOIN dim_payment dp ON d.payment_type = dp.payment_nk
      |  LEFT JOIN dim_rate dr ON d.rate_code = dr.rate_nk
      |  LEFT JOIN dim_flag df ON d.flag_raw = df.flag_nk
      |  LEFT JOIN dim_location pu ON d.pu_location_id = pu.loc_nk
      |  LEFT JOIN dim_location dol ON d.do_location_id = dol.loc_nk
      |)""".stripMargin

  /** Wrap a SELECT with the full taxi CTE chain (unreferenced CTEs are
    * pruned by DuckDB's planner — zero cost). */
  def taxi(select: String): String =
    s"WITH $trips, $tripsDup, $paymentMap, $cleaned, $deduped, $dims, $fact\n$select"

  /** Same, with extra query-specific CTEs appended to the chain (a query
    * cannot open its own `WITH` — it would nest). */
  def taxiWith(extraCtes: String, select: String): String =
    s"WITH $trips, $tripsDup, $paymentMap, $cleaned, $deduped, $dims, $fact,\n$extraCtes\n$select"
}
