package graft.oracle

/** DuckDB-dialect mirror of [[graft.model.EventsModel]] +
  * [[graft.stream.StreamTransforms]].
  *
  * Computes the *typed* stream-event results directly from `events.parquet`
  * (no JSON round trip): the declared Spark queries go through
  * envelope-build → `from_json` → dual-key coalesce, so an oracle match
  * proves the wire path is value-preserving.
  */
object StreamOracle {

  val typed: String =
    """ev_typed AS (
      |  SELECT
      |    event_id,
      |    CAST(ts AS TIMESTAMP) AS arrival_ts,
      |    CASE WHEN event_id % 23 = 0 THEN NULL
      |         ELSE CAST(ts AS TIMESTAMP) - to_seconds(
      |           CASE WHEN event_id % 37 = 0 THEN -300
      |                WHEN event_id % 41 = 0 THEN 30000
      |                ELSE (event_id * 7919) % 3000 + 60 END) END AS pickup_ts,
      |    CASE WHEN event_id % 29 = 0 THEN NULL
      |         ELSE CAST(ts AS TIMESTAMP) END AS dropoff_ts,
      |    'v' || CAST(user_id % 5 AS VARCHAR) AS vendor_id,
      |    json_extract(props, '$.k')::BIGINT AS passenger_count,
      |    value / 20 - CASE WHEN event_id % 43 = 0 THEN 30 ELSE 0 END AS trip_distance,
      |    value - CASE WHEN event_id % 31 = 0 THEN 500 ELSE 0 END AS fare_amount,
      |    value / 10 AS tip_amount,
      |    value AS total_amount,
      |    CASE WHEN user_id % 4 = 0 THEN 'CRD' WHEN user_id % 4 = 1 THEN 'CSH'
      |         WHEN user_id % 4 = 2 THEN '1' ELSE 'ZZ' END AS payment_type,
      |    CAST(ts AS TIMESTAMP) AS producer_ts
      |  FROM events
      |)""".stripMargin

  val enriched: String =
    """ev_enriched AS (
      |  SELECT *,
      |    date_diff('minute', pickup_ts, dropoff_ts) AS duration_min,
      |    (pickup_ts IS NULL OR dropoff_ts IS NULL) AS flag_missing_required,
      |    (trip_distance < 0 OR fare_amount < 0 OR total_amount < 0)
      |      AS flag_negative_values,
      |    (date_diff('minute', pickup_ts, dropoff_ts) < 0
      |     OR date_diff('minute', pickup_ts, dropoff_ts) > 480) AS flag_bad_duration
      |  FROM ev_typed
      |)""".stripMargin

  val routed: String =
    """ev_routed AS (
      |  SELECT *,
      |    CASE WHEN flag_missing_required THEN 'missing_required'
      |         WHEN flag_negative_values THEN 'negative_values'
      |         WHEN coalesce(flag_bad_duration, false) THEN 'bad_duration' END AS reason,
      |    CASE WHEN flag_missing_required OR flag_negative_values
      |              OR coalesce(flag_bad_duration, false)
      |         THEN 'dlq' ELSE 'curated' END AS sink,
      |    'date=' || strftime(arrival_ts, '%Y/%m/%d/%H') AS hour_path
      |  FROM ev_enriched
      |)""".stripMargin

  /** Signed-positive 8-byte SHA-256 prefix of `eventId|pickupISO|dropoffISO`
    * (millisecond ISO render, NULL → ''). */
  val slice: String =
    """ev_slice AS (
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT r.*,
      |      abs(CASE WHEN u >= 9223372036854775808::UBIGINT
      |               THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
      |               ELSE CAST(u AS BIGINT) END) AS trip_id,
      |      hour_path || '/part-' || CAST(event_id % 3 AS VARCHAR) || '.csv' AS _blobPath,
      |      arrival_ts AS _ingestedAt,
      |      row_number() OVER (
      |        PARTITION BY abs(CASE WHEN u >= 9223372036854775808::UBIGINT
      |               THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
      |               ELSE CAST(u AS BIGINT) END)
      |        ORDER BY producer_ts DESC, arrival_ts DESC, event_id DESC) AS rn
      |    FROM (
      |      SELECT *,
      |        ('0x' || substr(sha256(concat_ws('|', CAST(event_id AS VARCHAR),
      |           coalesce(strftime(pickup_ts, '%Y-%m-%dT%H:%M:%S.%g'), ''),
      |           coalesce(strftime(dropoff_ts, '%Y-%m-%dT%H:%M:%S.%g'), ''))), 1, 16))::UBIGINT AS u
      |      FROM ev_routed WHERE sink = 'curated') r) s
      |  WHERE rn = 1
      |)""".stripMargin

  /** Wrap a SELECT with the stream CTE chain over `events`. */
  def stream(select: String): String =
    s"WITH $typed, $enriched, $routed, $slice\n$select"

  def streamWith(extraCtes: String, select: String): String =
    s"WITH $typed, $enriched, $routed, $slice,\n$extraCtes\n$select"

  /** BOTH lanes' chains in one query (the dual-lane merged star): the
    * full taxi chain over `lineitem` plus the stream chain over `events`.
    * CTE namespaces are disjoint (taxi: trips…fact; stream: ev_*);
    * DuckDB prunes whatever the SELECT doesn't reference. */
  def lambdaWith(extraCtes: String, select: String): String =
    s"WITH ${OracleCte.trips}, ${OracleCte.tripsDup}, ${OracleCte.paymentMap}, " +
      s"${OracleCte.cleaned}, ${OracleCte.deduped}, ${OracleCte.dims}, " +
      s"${OracleCte.fact},\n$typed, $enriched, $routed, $slice,\n$extraCtes\n$select"
}
