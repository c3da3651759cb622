package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QFn
import graft.model.EventsModel
import graft.oracle.StreamOracle.{lambdaWith, stream, streamWith}
import graft.stream.StreamTransforms

/** Streaming-lane operator queries (SURVEY.md §2.8) declared over the
  * `events` fixture as *batch* programs — the identical
  * [[StreamTransforms]] column programs also run on real streaming frames
  * in [[graft.stream.Ingest]]; the oracle here proves their semantics,
  * ScalaTest proves the streaming plumbing.
  *
  * The Spark side goes events → JSON envelope → `from_json` → dual-key
  * coalesce; the DuckDB oracle computes typed values directly, so a match
  * also certifies the wire round trip.
  */
object StreamQueries {

  private def routed(s: SparkSession, d: String) = Memo(s"$d/ev_routed") {
    EventsModel.routed(s, d)
  }
  private def slice(s: SparkSession, d: String) = Memo(s"$d/ev_slice") {
    StreamTransforms.buildSlice(routed(s, d), lit("run-fixed")).drop("_runId")
  }

  /** Materialize the shared events-chain memos (parsed → routed → slice)
    * so per-query bench timings are steady-state (see
    * [[TaxiQueries.warm]]). */
  def warm(s: SparkSession, d: String): Unit = {
    Memo(s"$d/ev_parsed")(EventsModel.parsed(s, d)).count(): Unit
    slice(s, d).count(): Unit // slice's plan pulls the routed cache
  }

  val queries: Map[String, QFn] = Map(
    "stream_parse_enrich" -> ((s, d) =>
      StreamTransforms.enrich(Memo(s"$d/ev_parsed")(EventsModel.parsed(s, d)))
        .select("event_id", "vendor_id", "pickup_ts", "dropoff_ts",
          "passenger_count", "trip_distance", "fare_amount", "total_amount",
          "payment_type", "duration_min")
        .orderBy("event_id")),

    "dual_key_coalesce" -> ((s, d) => Memo(s"$d/ev_parsed")(EventsModel.parsed(s, d))
      .select(col("event_id"),
        (col("event_id") % 2 === 0).as("was_camel_case"),
        col("vendor_id"), col("payment_type"), col("pickup_ts"), col("producer_ts"))
      .orderBy("event_id")),

    "stream_dq_flags" -> ((s, d) =>
      StreamTransforms.enrich(Memo(s"$d/ev_parsed")(EventsModel.parsed(s, d)))
        .select("event_id", "flag_missing_required", "flag_negative_values",
          "flag_bad_duration")
        .orderBy("event_id")),

    "stream_route" -> ((s, d) => routed(s, d)
      .select("event_id", "sink", "reason")
      .orderBy("event_id")),

    "sink_multiplex_3way" -> ((s, d) => routed(s, d)
      .agg(count(lit(1)).as("raw_rows"),
        sum(when(col("sink") === "curated", 1).otherwise(0)).cast("long").as("curated_rows"),
        sum(when(col("sink") === "dlq", 1).otherwise(0)).cast("long").as("dlq_rows"))),

    "stream_hourly_window" -> ((s, d) => routed(s, d)
      .groupBy("hour_path").agg(count(lit(1)).as("events"))
      .orderBy("hour_path")),

    "microbatch_hour" -> ((s, d) => routed(s, d)
      .filter(col("hour_path").startsWith("date=2024/01/01/"))
      .select("event_id", "hour_path", "sink")
      .orderBy("event_id")),

    // Rolling z-score anomaly detection on hourly ingest volume per sink
    // (24-hour trailing window): the monitoring op that pages before a
    // quality gate fails downstream. Every windowed sum is an INTEGER sum
    // (exact, order-free); mean/variance/z derive from those ints in
    // fixed double expressions, so both engines agree bit-for-bit. One
    // shuffle on sink; the window is rows-bounded → O(1) state per row.
    "win_anomaly_zscore" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = routed(s, d)
        .groupBy("sink", "hour_path").agg(count(lit(1)).as("events"))
      val w = Window.partitionBy("sink").orderBy("hour_path").rowsBetween(-23, 0)
      hourly
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("sum_win", sum(col("events")).over(w))
        .withColumn("sumsq_win", sum(col("events") * col("events")).over(w))
        .withColumn("mean", col("sum_win").cast("double") / col("n_win"))
        .withColumn("varr", when(col("n_win") > 1,
          (col("sumsq_win").cast("double") -
            col("sum_win").cast("double") * col("sum_win") / col("n_win")) /
            (col("n_win") - 1)))
        .withColumn("z", when(col("varr") > 0,
          (col("events") - col("mean")) / sqrt(col("varr"))))
        .withColumn("is_anomaly", coalesce(abs(col("z")) > 3.0, lit(false)))
        .select("sink", "hour_path", "events", "n_win", "mean", "z", "is_anomaly")
        .orderBy("sink", "hour_path")
    }),

    // Robust rolling statistics — exact median/IQR over the same trailing
    // 24h frame as win_anomaly_zscore, the monitor you actually want when
    // the volume series itself has spikes (one burst hour inflates a
    // mean+stddev gate for a day; it barely moves the median). The
    // percentile aggregate runs over the HOURLY census (bounded by
    // calendar × sinks, not fact size), so the O(frame) recompute per row
    // is scale-free. Exactness: every frame value is an integer count, so
    // each interpolated quantile is a dyadic rational both engines
    // compute exactly — no rounding needed, the hash match is bit-for-bit.
    "win_rolling_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = routed(s, d)
        .groupBy("sink", "hour_path").agg(count(lit(1)).as("events"))
      val w = Window.partitionBy("sink").orderBy("hour_path").rowsBetween(-23, 0)
      hourly
        .withColumn("med", percentile(col("events"), lit(0.5)).over(w))
        .withColumn("p25", percentile(col("events"), lit(0.25)).over(w))
        .withColumn("p75", percentile(col("events"), lit(0.75)).over(w))
        .select(col("sink"), col("hour_path"), col("events"), col("med"),
          col("p25"), col("p75"), (col("p75") - col("p25")).as("iqr"),
          (col("events") > col("med") + lit(3.0) * (col("p75") - col("p25")))
            .as("is_spike"))
        .orderBy("sink", "hour_path")
    }),

    // Distribution-drift monitor (PSI): the value histogram of the second
    // half of the month vs the first, per event type — the check a
    // training-data pipeline runs on every incoming batch so a silently
    // shifted upstream (new client version, changed sampler) is caught
    // before it poisons a training mix. PSI = Σ_bins (p_cur − p_ref) ·
    // ln(p_cur / p_ref) over a fixed 20-bin histogram with Laplace
    // smoothing (the +1 keeps empty bins finite and the full bin spine
    // keeps the sum well-defined).
    //
    // Scale: two census-sized aggregations (types × bins ≤ hundreds of
    // rows after the map-side-combined count) + a broadcast-sized spine
    // cross join — nothing grows with the event count. Determinism: bin
    // ids and probabilities are exact integer ratios evaluated in fixed
    // IEEE expressions; the one libm call (ln) is rounded to 12 decimals
    // and the per-bin terms are DECIMAL-summed (order-free) — the same
    // pattern as every float-bearing query in this repo.
    "drift_psi" -> ((s, d) => {
      val ev0 = graft.Tables(s, d, "events")
      val binned = ev0
        .select(col("event_type"),
          graft.Tables.eventTsNtz(ev0).as("ts"),
          col("value"))
        .withColumn("bin", least(floor(col("value") / 25.0), lit(19.0)).cast("int"))
        .withColumn("is_ref",
          when(col("ts") < lit("2024-01-16").cast("timestamp_ntz"), 1).otherwise(0))
      graft.quality.Drift.psi(binned, "event_type", "bin", "is_ref", 20)
        .orderBy("event_type")
    }),

    // Nearest-in-time as-of join (ops/AsofJoin.nearest): each error event
    // aligned to the closest purchase by the same user, before OR after,
    // ties to the earlier side — the sensor-stream alignment where
    // "latest reading" (plain backward as-of) is wrong half the time.
    // Same-user same-timestamp purchase duplicates resolve to the MAX
    // payload struct (AsofJoin's window tiebreak), which the oracle
    // mirrors with `pur_value DESC` — no reliance on the fixture never
    // producing duplicate (user_id, ts) purchases.
    // Two one-shuffle as-of passes composed; epoch-microsecond longs
    // (nanos div 1000 — DuckDB timestamps are µs, so the oracle computes
    // the same integers) keep the distance arithmetic exact.
    "join_asof_nearest" -> ((s, d) => {
      val ev0 = graft.Tables(s, d, "events")
      val ev = ev0
        .select(col("event_id"), col("user_id"), col("event_type"),
          graft.Tables.eventTsMicros(ev0).as("ts_us"), col("value"))
      val left = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts_us").as("err_ts"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("pur_ts"),
          col("value").as("pur_value"))
      graft.ops.AsofJoin.nearest(left, right, Seq("user_id"),
          "err_ts", "pur_ts", Seq("pur_value"))
        .select(col("event_id"), col("user_id"), col("pur_value"),
          col("matched_ts"))
        .orderBy("event_id")
    }),

    // Ordered conversion funnel view → click → purchase: first view, first
    // click AFTER that view, first purchase AFTER that click, per user —
    // the product-analytics staple where naive per-type mins overcount
    // (a click before the first view is not a conversion). Three
    // user-census aggregations chained by joins on user_id; the raw
    // nanosecond `ts` longs compare order-isomorphically to the oracle's
    // timestamps, and the final row is exact counts + two IEEE ratios.
    "funnel_stages" -> ((s, d) => {
      val ev = graft.Tables(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val stages = Seq("view", "click", "purchase")
      graft.ops.Funnel.summary(
          graft.ops.Funnel.stageTimes(ev, "user_id", "event_type", "ts", stages),
          stages)
        .select(col("n_users"), col("n_view"), col("n_click"), col("n_purchase"),
          (col("n_click").cast("double") / col("n_view")).as("view_to_click"),
          (col("n_purchase").cast("double") / col("n_click")).as("click_to_purchase"))
    }),

    // Weekly retention cohorts: users grouped by first-seen week, counted
    // in each later week they return — the engagement report behind every
    // "week 1 retention" number. Day ids are integer nanosecond divides
    // (exact), cohorts/offsets integer divides of those, and the output
    // is a distinct-user census per (cohort, offset) cell: all-integer,
    // two shuffles (user census + cell rollup), nothing float-bearing.
    "agg_retention_cohort" -> ((s, d) => {
      val ev0 = graft.Tables(s, d, "events")
      val ev = ev0
        .select(col("user_id"), graft.Tables.eventTsMicros(ev0).as("ts_us"))
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
      ev.join(first, "user_id")
        .select(col("user_id"),
          // epoch day 19723 = 2024-01-01, the fixture's first day
          expr("(first_day - 19723) div 7").as("cohort_week"),
          expr("(day - first_day) div 7").as("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset").agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Sensor gap-fill: a reading is missing when the event errored; carry
    // the user's last good reading forward (ordered by event_id). The
    // time-series repair every telemetry pipeline runs before windowed
    // aggregation — built-in `last(ignoreNulls)` over a running frame,
    // one shuffle on user_id, O(1) state per row. Values pass through
    // untouched (no float arithmetic), so determinism is just the total
    // ORDER BY.
    "win_fill_forward" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .withColumn("v_raw", when(col("event_type") =!= "error", col("value")))
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.withColumn("v_filled", last(col("v_raw"), ignoreNulls = true).over(w))
        .withColumn("was_filled", col("v_raw").isNull && col("v_filled").isNotNull)
        .select("event_id", "user_id", "v_raw", "v_filled", "was_filled")
        .orderBy("event_id")
    }),

    "win_dedupe_stream" -> ((s, d) => slice(s, d)
      .select("trip_id", "event_id", "producer_ts")
      .orderBy("trip_id")),

    "slice_rebuild" -> ((s, d) => slice(s, d)
      .select(col("trip_id"), col("event_id"), col("_blobPath"),
        col("_ingestedAt"), col("fare_amount"), col("payment_type"))
      .orderBy("trip_id")),

    "stream_upsert" -> ((s, d) => {
      val sl = slice(s, d)
      val target = sl.filter(to_date(col("arrival_ts")) < "2024-01-15")
      val staged = sl.filter(to_date(col("arrival_ts")).between("2024-01-10", "2024-01-20"))
      StreamTransforms.mergeByTripId(target, staged, Seq("fare_amount", "total_amount"))
        .groupBy("merge_action").agg(count(lit(1)).as("cnt"))
        .orderBy("merge_action")
    }),

    // The dual-lane merged star as a declared, oracle-checked program
    // (the lambda promise LambdaSpec proves physically): batch fact rows
    // (SHA-256 hex trip_id, ref 40_fact_trip.load.sql:70-79) and already-
    // loaded stream rows form ONE target; a re-delivered stream window is
    // MERGEd on trip_id (usp_upsert_fact_trip_streaming.sql:88-90) via the
    // production merge program. The lane split falls out of the key
    // FORMAT (64-hex vs ≤19 decimal digits) — and the oracle certifies
    // the invariant that makes the architecture sound: batch rows are
    // 'unchanged' under any stream merge, stream re-delivery updates only
    // its own keyspace.
    "lambda_merged_star" -> ((s, d) => {
      val bFact = TaxiQueries.factDf(s, d)
        .select(col("trip_id"), col("fare_amount"))
      val st = slice(s, d).select(col("trip_id").cast("string").as("trip_id"),
        col("fare_amount"), col("arrival_ts"))
      val target = bFact.unionByName(
        st.filter(to_date(col("arrival_ts")) < "2024-01-15").drop("arrival_ts"))
      val staged = st.filter(
        to_date(col("arrival_ts")).between("2024-01-10", "2024-01-20"))
        .drop("arrival_ts")
      StreamTransforms.mergeByTripId(target, staged, Seq("fare_amount"))
        .groupBy(
          when(length(col("trip_id")) === 64, "batch").otherwise("stream")
            .as("lane"),
          col("merge_action"))
        .agg(count(lit(1)).as("trips"),
          round(sum(col("fare_amount").cast("decimal(18,6)")), 2)
            .cast("double").as("total_fare"))
        .orderBy("lane", "merge_action")
    }),

    // The merged-star BI view's QA measures as a declared, oracle-checked
    // program (VERDICT r15 #4; Lambda.biView is the live-warehouse frame,
    // spec-proven SQL==API in LambdaSpec — THIS certifies the measure
    // semantics against DuckDB). Mirrors vw_fact_trip_bi.view.sql:36-49:
    // tip_pct guarded on fare_amount > 0, fare_per_km on
    // trip_distance_km > 0, per lane over the same two-lane union as
    // lambda_merged_star (batch fact SHA-256-hex keys, stream hash64
    // decimal renders; stream km = the production miles→km conversion).
    // Ratio-of-sums over exact DECIMAL(18,6) sums keeps the emitted
    // doubles order-independent (FLOATS.md) — the BI aggregate a
    // dashboard computes over the view's per-row measures.
    "lambda_bi_measures" -> ((s, d) => {
      import graft.functions.TaxiFunctions.milesToKm
      val b = TaxiQueries.factDf(s, d)
        .select(col("trip_id"), col("trip_distance_km"),
          col("fare_amount"), col("tip_amount"))
      val st = slice(s, d).select(
        col("trip_id").cast("string").as("trip_id"),
        milesToKm(col("trip_distance")).as("trip_distance_km"),
        col("fare_amount"), col("tip_amount"))
      def dsumIf(cond: org.apache.spark.sql.Column, c: String) =
        sum(when(cond, col(c)).cast("decimal(18,6)")).cast("double")
      val fareOk = col("fare_amount") > 0
      val kmOk = col("trip_distance_km") > 0
      b.unionByName(st)
        .groupBy(when(length(col("trip_id")) === 64, "batch")
          .otherwise("stream").as("lane"))
        .agg(count(lit(1)).as("trips"),
          count(when(fareOk, 1)).as("tip_pct_rows"),
          (dsumIf(fareOk, "tip_amount") /
            nullif(dsumIf(fareOk, "fare_amount"), lit(0.0))).as("tip_pct"),
          count(when(kmOk, 1)).as("fare_per_km_rows"),
          (dsumIf(kmOk, "fare_amount") /
            nullif(dsumIf(kmOk, "trip_distance_km"), lit(0.0)))
            .as("fare_per_km"))
        .orderBy("lane")
    }),

    "idempotent_reload_blob" -> ((s, d) => {
      // DELETE-by-blob-then-recopy semantics: loading the same blobs twice
      // then applying per-blob idempotency must equal a single load.
      val once = slice(s, d)
      val twice = once.unionByName(once)
        .dropDuplicates("_blobPath", "trip_id") // delete WHERE _blobPath=@p + re-copy
      twice.groupBy("_blobPath").agg(count(lit(1)).as("rows"))
        .orderBy("_blobPath")
    }),

    "run_purge" -> ((s, d) => {
      // Slice keyed by run (= arrival hour); purge run-day 2024-01-01,
      // report surviving rows per day (ref: usp_purge_trip_clean_slice*).
      slice(s, d)
        .filter(to_date(col("arrival_ts")) =!= "2024-01-01")
        .groupBy(to_date(col("arrival_ts")).cast("string").as("run_day"))
        .agg(count(lit(1)).as("rows"))
        .orderBy("run_day")
    }),

    // Azure-Monitor-style static-threshold alerts over 15-min windows
    // (ops/AlertRules — alerts.bicep semantics): DLQ errors > 5 per
    // window (the OutputError rule) and incoming < 1 (the liveness
    // rule, evaluated over a generated window SPINE so silent gaps
    // produce firing rows instead of missing groups). One pass computes
    // both measures; per-rule rows explode from a literal array.
    "alert_rules_eval" -> ((s, d) => graft.ops.AlertRules.evaluate(
      routed(s, d), "arrival_ts", 15, Seq(
        graft.ops.AlertRule("dlq-errors", 2,
          sum(when(col("sink") === "dlq", 1L).otherwise(0L)),
          greaterThan = true, 5.0),
        graft.ops.AlertRule("incoming-drop", 3, count(lit(1)),
          greaterThan = false, 1.0)))),

    "dlq_audit" -> ((s, d) => routed(s, d)
      .groupBy(to_date(col("arrival_ts")).cast("string").as("audit_day"))
      .agg(
        sum(when(col("sink") === "curated", 1).otherwise(0)).cast("long").as("good_rows"),
        sum(when(col("sink") === "dlq", 1).otherwise(0)).cast("long").as("dlq_rows"),
        sum(when(col("reason") === "missing_required", 1).otherwise(0)).cast("long")
          .as("missing_required"),
        sum(when(col("reason") === "negative_values", 1).otherwise(0)).cast("long")
          .as("negative_values"),
        sum(when(col("reason") === "bad_duration", 1).otherwise(0)).cast("long")
          .as("bad_duration"))
      .orderBy("audit_day")),

    "stream_windowed_agg" -> ((s, d) =>
      graft.stream.WindowedStats.hourlyQualityCounts(routed(s, d))
        .orderBy("hour_start", "sink")),

    // windowed mergeable quantile (stream/WindowedStats.windowedQuantile):
    // per (hour, sink) p50 fare from the O(bins) histogram state a
    // streaming agg can actually carry — WindowedStatsSpec proves the
    // streaming run merges to this exact batch answer
    "stream_quantile_window" -> ((s, d) =>
      graft.stream.WindowedStats.windowedQuantile(
          routed(s, d).filter(col("fare_amount").isNotNull),
          "fare_amount", 0.0, 500.0, 50, 0.5)
        .orderBy("hour_start", "sink")),

    // ASA HoppingWindow(hour,1,minute,30) analog: overlapping windows
    "stream_hopping_window" -> ((s, d) =>
      graft.stream.WindowedStats.hoppingQualityCounts(routed(s, d))
        .orderBy("win_start", "sink")),

    // ASA SessionWindow analog: 10-minute-gap sessions per vendor
    "stream_session_window" -> ((s, d) =>
      graft.stream.WindowedStats.vendorSessions(routed(s, d), 10)
        .orderBy("session_start", "vendor_id")),

    // event-level sessionization (the assignment mirror of
    // stream_session_window's rollup): every event stamped with its
    // per-user 30-minute-gap session ordinal — ops/Sessionize, one
    // exchange + one sort (lag + running count share the window spec)
    "win_sessionize" -> ((s, d) => {
      val ev0 = graft.Tables(s, d, "events")
      val ev = ev0
        .select(col("event_id"), col("user_id"),
          graft.Tables.eventTsMicros(ev0).as("ts_us"))
      graft.ops.Sessionize.assign(ev, Seq("user_id"), "ts_us",
          Seq("event_id"), 30L * 60 * 1000000)
        .orderBy("user_id", "ts_us", "event_id")
    }),

    "late_data" -> ((s, d) => {
      // Replays of hour-H events arriving at H+1 are absorbed by the
      // deterministic-id dedupe: slice cardinality is unchanged.
      val parsedBase = Memo(s"$d/ev_parsed")(EventsModel.parsed(s, d))
      val replayed = StreamTransforms.route(StreamTransforms.enrich(
        EventsModel.withReplays(parsedBase)))
      // the base slice IS the memoized slice (same routed input, same
      // runId-independent columns after the drop) — only the replayed
      // variant needs a fresh build per invocation
      val origCnt = slice(s, d)
        .agg(count(lit(1)).as("orig_rows"))
      val replayCnt = StreamTransforms.buildSlice(replayed, lit("r")).drop("_runId")
        .agg(count(lit(1)).as("after_replay_rows"))
      origCnt.crossJoin(replayCnt)
        .select(col("orig_rows"), col("after_replay_rows"),
          (col("orig_rows") === col("after_replay_rows")).as("absorbed"))
    }),

    // deterministic mergeable quantile sketch (ops/QuantileSketch):
    // 50 bins over [0, 500) estimate the per-type median with error
    // bounded by the bin width; compared in-row against the exact
    // percentile (which needs the full value shuffle the sketch avoids)
    "agg_quantile_sketch" -> ((s, d) => {
      val ev = graft.Tables(s, d, "events").select(col("event_type"), col("value"))
      val sk = graft.ops.QuantileSketch.estimate(
        ev, Seq("event_type"), "value", 0.0, 500.0, 50, 0.5)
      val exact = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("exact_p50"))
      sk.join(exact, "event_type")
        .withColumn("abs_err", abs(col("est") - col("exact_p50")))
        .orderBy("event_type")
    }),

    // CDC change-feed apply: snapshot = each user's last pre-Jan-15
    // state, feed = later events as a change log ('error' → D, else U),
    // last-writer-wins by (ts, event_id) — ops/CdcApply, one shuffle
    // (union + per-key winner window, no join)
    "source_cdc_apply" -> ((s, d) => {
      val cut = 1705276800000000L // 2024-01-15T00:00:00Z epoch micros
      val ev0 = graft.Tables(s, d, "events")
      val ev = ev0
        .select(col("user_id"), col("event_type"), col("value"),
          graft.Tables.eventTsMicros(ev0).as("ts_us"), col("event_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
      val snapshot = ev.filter(col("ts_us") < cut)
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select("user_id", "event_type", "value")
      val changes = ev.filter(col("ts_us") >= cut)
        .withColumn("op",
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
        .select("user_id", "op", "event_type", "value", "ts_us", "event_id")
      graft.ops.CdcApply(snapshot, changes, Seq("user_id"),
          Seq("ts_us", "event_id"))
        .orderBy("user_id")
    }),

    // SCD2 dimension history assembled from the event change log: per
    // user, one row per event_type VERSION with [from, to) validity in
    // epoch-micros and an is_current flag — the dimension-history op the
    // reference's SCD1 (insert-new-members-only) upsert lacks.
    // ops/Scd2: lag-based change detection + lead-based validity share
    // ONE window spec → one shuffle on the key, no self-join.
    "scd2_history" -> ((s, d) => {
      val ev0 = graft.Tables(s, d, "events")
      val ev = ev0
        .select(col("event_id"), col("user_id"), col("event_type"),
          graft.Tables.eventTsMicros(ev0).as("ts_us"))
      graft.ops.Scd2.fromChangeLog(ev, Seq("user_id"),
          Seq("ts_us", "event_id"), Seq("event_type"), "ts_us")
        .select(col("user_id"), col("event_type"),
          col("effective_from").as("from_us"), col("effective_to").as("to_us"),
          col("is_current"))
        .orderBy("user_id", "from_us", "event_type")
    }))

  val oracles: Map[String, String] = Map(
    "stream_parse_enrich" -> stream(
      """SELECT event_id, vendor_id, pickup_ts, dropoff_ts, passenger_count,
        |  trip_distance, fare_amount, total_amount, payment_type, duration_min
        |FROM ev_enriched ORDER BY event_id""".stripMargin),

    "dual_key_coalesce" -> stream(
      """SELECT event_id, event_id % 2 = 0 AS was_camel_case, vendor_id,
        |  payment_type, pickup_ts, producer_ts
        |FROM ev_typed ORDER BY event_id""".stripMargin),

    "stream_dq_flags" -> stream(
      """SELECT event_id, flag_missing_required, flag_negative_values,
        |  flag_bad_duration
        |FROM ev_enriched ORDER BY event_id""".stripMargin),

    "stream_route" -> stream(
      """SELECT event_id, sink, reason FROM ev_routed ORDER BY event_id""".stripMargin),

    "sink_multiplex_3way" -> stream(
      """SELECT count(*) AS raw_rows,
        |  CAST(sum(CASE WHEN sink = 'curated' THEN 1 ELSE 0 END) AS BIGINT) AS curated_rows,
        |  CAST(sum(CASE WHEN sink = 'dlq' THEN 1 ELSE 0 END) AS BIGINT) AS dlq_rows
        |FROM ev_routed""".stripMargin),

    "stream_hourly_window" -> stream(
      """SELECT hour_path, count(*) AS events FROM ev_routed
        |GROUP BY 1 ORDER BY hour_path""".stripMargin),

    "microbatch_hour" -> stream(
      """SELECT event_id, hour_path, sink FROM ev_routed
        |WHERE hour_path LIKE 'date=2024/01/01/%' ORDER BY event_id""".stripMargin),

    "win_anomaly_zscore" -> streamWith(
      """hrz AS (
        |  SELECT sink, hour_path, count(*) AS events
        |  FROM ev_routed GROUP BY 1, 2
        |), wz AS (
        |  SELECT sink, hour_path, events,
        |    count(*) OVER w AS n_win,
        |    sum(events) OVER w AS sum_win,
        |    sum(events * events) OVER w AS sumsq_win
        |  FROM hrz
        |  WINDOW w AS (PARTITION BY sink ORDER BY hour_path
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
        |), mz AS (
        |  SELECT sink, hour_path, events, CAST(n_win AS BIGINT) AS n_win,
        |    CAST(sum_win AS DOUBLE) / n_win AS mean,
        |    CASE WHEN n_win > 1 THEN
        |      (CAST(sumsq_win AS DOUBLE)
        |        - CAST(sum_win AS DOUBLE) * sum_win / n_win) / (n_win - 1)
        |    END AS varr
        |  FROM wz)""".stripMargin,
      """SELECT sink, hour_path, events, n_win, mean,
        |  CASE WHEN varr > 0 THEN (events - mean) / sqrt(varr) END AS z,
        |  coalesce(CASE WHEN varr > 0
        |    THEN abs((events - mean) / sqrt(varr)) > 3.0 END, false) AS is_anomaly
        |FROM mz ORDER BY sink, hour_path""".stripMargin),

    // integer frame values → every interpolated quantile is a dyadic
    // rational both engines hit exactly (see the engine-side comment)
    "win_rolling_median" -> streamWith(
      """hrm AS (
        |  SELECT sink, hour_path, count(*) AS events
        |  FROM ev_routed GROUP BY 1, 2
        |), wrm AS (
        |  SELECT sink, hour_path, events,
        |    median(events) OVER w AS med,
        |    quantile_cont(events, 0.25) OVER w AS p25,
        |    quantile_cont(events, 0.75) OVER w AS p75
        |  FROM hrm
        |  WINDOW w AS (PARTITION BY sink ORDER BY hour_path
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))""".stripMargin,
      """SELECT sink, hour_path, events, med, p25, p75, p75 - p25 AS iqr,
        |  events > med + 3.0 * (p75 - p25) AS is_spike
        |FROM wrm ORDER BY sink, hour_path""".stripMargin),

    "drift_psi" -> streamWith(
      """pbin AS (
        |  SELECT event_type,
        |    CAST(least(floor(value / 25.0), 19.0) AS INT) AS bin,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
        |  FROM events
        |), pcounts AS (
        |  SELECT event_type, bin,
        |    CAST(sum(is_ref) AS BIGINT) AS c_ref,
        |    CAST(sum(1 - is_ref) AS BIGINT) AS c_cur
        |  FROM pbin GROUP BY 1, 2
        |), pspine AS (
        |  SELECT t.event_type, b.bin
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(range(0, 20)) AS bin) b
        |), pfull AS (
        |  SELECT s.event_type, s.bin,
        |    coalesce(c.c_ref, 0) AS c_ref, coalesce(c.c_cur, 0) AS c_cur
        |  FROM pspine s LEFT JOIN pcounts c
        |    ON s.event_type = c.event_type AND s.bin = c.bin
        |), ptot AS (
        |  SELECT *,
        |    CAST(sum(c_ref) OVER (PARTITION BY event_type) AS BIGINT) AS tot_ref,
        |    CAST(sum(c_cur) OVER (PARTITION BY event_type) AS BIGINT) AS tot_cur
        |  FROM pfull
        |), pterms AS (
        |  SELECT event_type, tot_ref, tot_cur,
        |    ((c_cur + 1) / (tot_cur + 20.0) - (c_ref + 1) / (tot_ref + 20.0))
        |      * round(ln(((c_cur + 1) / (tot_cur + 20.0))
        |                 / ((c_ref + 1) / (tot_ref + 20.0))), 12) AS term
        |  FROM ptot)""".stripMargin,
      """SELECT event_type, tot_ref AS n_ref, tot_cur AS n_cur,
        |  CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE) AS psi,
        |  CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE) >= 0.1 AS drifted
        |FROM pterms GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin),

    "join_asof_nearest" -> streamWith(
      """nl AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS err_ts
        |  FROM events WHERE event_type = 'error'
        |), nr AS (
        |  SELECT user_id, epoch_us(ts) AS pur_ts, value AS pur_value
        |  FROM events WHERE event_type = 'purchase'
        |), np AS (
        |  SELECT l.event_id, r.pur_value, r.pur_ts,
        |    row_number() OVER (PARTITION BY l.event_id ORDER BY
        |      abs(l.err_ts - r.pur_ts), (r.pur_ts > l.err_ts),
        |      r.pur_value DESC) AS rn
        |  FROM nl l JOIN nr r ON l.user_id = r.user_id
        |), nb AS (
        |  SELECT event_id, pur_value, pur_ts FROM np WHERE rn = 1)""".stripMargin,
      """SELECT l.event_id, l.user_id, nb.pur_value,
        |  CAST(nb.pur_ts AS BIGINT) AS matched_ts
        |FROM nl l LEFT JOIN nb ON l.event_id = nb.event_id
        |ORDER BY l.event_id""".stripMargin),

    "funnel_stages" -> streamWith(
      """fu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY 1
        |), fc AS (
        |  SELECT e.user_id, fu.t_view,
        |    min(CASE WHEN e.event_type = 'click' AND e.ts > fu.t_view
        |        THEN e.ts END) AS t_click
        |  FROM events e JOIN fu ON e.user_id = fu.user_id GROUP BY 1, 2
        |), fp AS (
        |  SELECT e.user_id, fc.t_view, fc.t_click,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > fc.t_click
        |        THEN e.ts END) AS t_purchase
        |  FROM events e JOIN fc ON e.user_id = fc.user_id GROUP BY 1, 2, 3)""".stripMargin,
      """SELECT count(*) AS n_users, count(t_view) AS n_view,
        |  count(t_click) AS n_click, count(t_purchase) AS n_purchase,
        |  count(t_click)::DOUBLE / count(t_view) AS view_to_click,
        |  count(t_purchase)::DOUBLE / count(t_click) AS click_to_purchase
        |FROM fp""".stripMargin),

    "agg_retention_cohort" -> streamWith(
      """rc AS (
        |  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        |  FROM events
        |), rf AS (SELECT user_id, min(day) AS first_day FROM rc GROUP BY 1),
        |ru AS (
        |  SELECT DISTINCT rc.user_id,
        |    (rf.first_day - 19723) // 7 AS cohort_week,
        |    (rc.day - rf.first_day) // 7 AS week_offset
        |  FROM rc JOIN rf ON rc.user_id = rf.user_id)""".stripMargin,
      """SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
        |  CAST(week_offset AS BIGINT) AS week_offset, count(*) AS n_users
        |FROM ru GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin),

    "win_fill_forward" -> streamWith(
      """ffo AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN event_type <> 'error' THEN value END AS v_raw
        |  FROM events
        |), ffw AS (
        |  SELECT event_id, user_id, v_raw,
        |    last_value(v_raw IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |  FROM ffo)""".stripMargin,
      """SELECT event_id, user_id, v_raw, v_filled,
        |  (v_raw IS NULL AND v_filled IS NOT NULL) AS was_filled
        |FROM ffw ORDER BY event_id""".stripMargin),

    "win_dedupe_stream" -> stream(
      """SELECT trip_id, event_id, producer_ts FROM ev_slice ORDER BY trip_id""".stripMargin),

    "slice_rebuild" -> stream(
      """SELECT trip_id, event_id, _blobPath, _ingestedAt, fare_amount,
        |  payment_type
        |FROM ev_slice ORDER BY trip_id""".stripMargin),

    "stream_upsert" -> streamWith(
      """tgt AS (SELECT * FROM ev_slice WHERE CAST(arrival_ts AS DATE) < DATE '2024-01-15'),
        |stg AS (SELECT * FROM ev_slice
        |        WHERE CAST(arrival_ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20')""".stripMargin,
      """SELECT merge_action, count(*) AS cnt FROM (
        |  SELECT CASE WHEN s.trip_id IS NOT NULL AND t.trip_id IS NOT NULL THEN 'updated'
        |              WHEN s.trip_id IS NOT NULL THEN 'inserted'
        |              ELSE 'unchanged' END AS merge_action
        |  FROM stg s FULL OUTER JOIN tgt t ON s.trip_id = t.trip_id) m
        |GROUP BY 1 ORDER BY merge_action""".stripMargin),

    "lambda_merged_star" -> lambdaWith(
      """b AS (SELECT trip_id, fare_amount FROM fact),
        |st AS (SELECT CAST(trip_id AS VARCHAR) AS trip_id, fare_amount, arrival_ts
        |       FROM ev_slice),
        |ltgt AS (SELECT trip_id, fare_amount FROM b
        |         UNION ALL
        |         SELECT trip_id, fare_amount FROM st
        |         WHERE CAST(arrival_ts AS DATE) < DATE '2024-01-15'),
        |lstg AS (SELECT trip_id, fare_amount FROM st
        |         WHERE CAST(arrival_ts AS DATE)
        |           BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'),
        |lmerged AS (
        |  SELECT coalesce(s.trip_id, t.trip_id) AS trip_id,
        |         CASE WHEN s.trip_id IS NOT NULL THEN s.fare_amount
        |              ELSE t.fare_amount END AS fare_amount,
        |         CASE WHEN s.trip_id IS NOT NULL AND t.trip_id IS NOT NULL
        |                THEN 'updated'
        |              WHEN s.trip_id IS NOT NULL THEN 'inserted'
        |              ELSE 'unchanged' END AS merge_action
        |  FROM lstg s FULL OUTER JOIN ltgt t ON s.trip_id = t.trip_id)""".stripMargin,
      """SELECT CASE WHEN length(trip_id) = 64 THEN 'batch' ELSE 'stream' END AS lane,
        |  merge_action, count(*) AS trips,
        |  CAST(round(sum(CAST(fare_amount AS DECIMAL(18,6))), 2) AS DOUBLE)
        |    AS total_fare
        |FROM lmerged GROUP BY 1, 2 ORDER BY lane, merge_action""".stripMargin),

    "lambda_bi_measures" -> lambdaWith(
      """lbi AS (
        |  SELECT trip_id, trip_distance_km, fare_amount, tip_amount FROM fact
        |  UNION ALL
        |  SELECT CAST(trip_id AS VARCHAR),
        |    round(trip_distance * 1.609344, 3), fare_amount, tip_amount
        |  FROM ev_slice)""".stripMargin,
      """SELECT
        |  CASE WHEN length(trip_id) = 64 THEN 'batch' ELSE 'stream' END AS lane,
        |  count(*) AS trips,
        |  count(CASE WHEN fare_amount > 0 THEN 1 END) AS tip_pct_rows,
        |  CAST(SUM(CASE WHEN fare_amount > 0
        |             THEN CAST(tip_amount AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / nullif(CAST(SUM(CASE WHEN fare_amount > 0
        |             THEN CAST(fare_amount AS DECIMAL(18,6)) END) AS DOUBLE),
        |             0.0) AS tip_pct,
        |  count(CASE WHEN trip_distance_km > 0 THEN 1 END) AS fare_per_km_rows,
        |  CAST(SUM(CASE WHEN trip_distance_km > 0
        |             THEN CAST(fare_amount AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / nullif(CAST(SUM(CASE WHEN trip_distance_km > 0
        |             THEN CAST(trip_distance_km AS DECIMAL(18,6)) END) AS DOUBLE),
        |             0.0) AS fare_per_km
        |FROM lbi GROUP BY 1 ORDER BY lane""".stripMargin),

    "idempotent_reload_blob" -> stream(
      """SELECT _blobPath, count(*) AS rows FROM ev_slice
        |GROUP BY 1 ORDER BY _blobPath""".stripMargin),

    "run_purge" -> stream(
      """SELECT CAST(CAST(arrival_ts AS DATE) AS VARCHAR) AS run_day, count(*) AS rows
        |FROM ev_slice WHERE CAST(arrival_ts AS DATE) <> DATE '2024-01-01'
        |GROUP BY 1 ORDER BY run_day""".stripMargin),

    "alert_rules_eval" -> streamWith(
      """wagg AS (
        |  SELECT CAST(floor(epoch(arrival_ts) / 900) * 900 AS BIGINT)
        |    AS window_start_s,
        |    count(*) AS incoming,
        |    sum(CASE WHEN sink = 'dlq' THEN 1 ELSE 0 END) AS dlq_errors
        |  FROM ev_routed GROUP BY 1
        |), bounds AS (
        |  SELECT min(window_start_s) AS lo, max(window_start_s) AS hi
        |  FROM wagg
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi, 900)) AS window_start_s
        |  FROM bounds
        |), joined AS (
        |  SELECT s.window_start_s,
        |    COALESCE(incoming, 0) AS incoming,
        |    COALESCE(dlq_errors, 0) AS dlq_errors
        |  FROM spine s LEFT JOIN wagg USING (window_start_s))""".stripMargin,
      """SELECT window_start_s, rule, severity, observed, threshold, firing
        |FROM (
        |  SELECT window_start_s, 'dlq-errors' AS rule, 2 AS severity,
        |    CAST(dlq_errors AS DOUBLE) AS observed, 5.0::DOUBLE AS threshold,
        |    CAST(dlq_errors AS DOUBLE) > 5.0 AS firing
        |  FROM joined
        |  UNION ALL
        |  SELECT window_start_s, 'incoming-drop', 3,
        |    CAST(incoming AS DOUBLE), 1.0::DOUBLE, CAST(incoming AS DOUBLE) < 1.0
        |  FROM joined) u
        |ORDER BY window_start_s, rule""".stripMargin),

    "dlq_audit" -> stream(
      """SELECT CAST(CAST(arrival_ts AS DATE) AS VARCHAR) AS audit_day,
        |  CAST(sum(CASE WHEN sink = 'curated' THEN 1 ELSE 0 END) AS BIGINT) AS good_rows,
        |  CAST(sum(CASE WHEN sink = 'dlq' THEN 1 ELSE 0 END) AS BIGINT) AS dlq_rows,
        |  CAST(sum(CASE WHEN reason = 'missing_required' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS missing_required,
        |  CAST(sum(CASE WHEN reason = 'negative_values' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS negative_values,
        |  CAST(sum(CASE WHEN reason = 'bad_duration' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bad_duration
        |FROM ev_routed GROUP BY 1 ORDER BY audit_day""".stripMargin),

    "stream_windowed_agg" -> stream(
      """SELECT date_trunc('hour', arrival_ts) AS hour_start, sink,
        |  count(*) AS events
        |FROM ev_routed GROUP BY 1, 2 ORDER BY hour_start, sink""".stripMargin),

    // histogram-sketch p50 replay: identical bin/cum/interpolate math as
    // WindowedStats.windowedQuantile (w=10, 50 bins over [0,500))
    "stream_quantile_window" -> graft.oracle.StreamOracle.streamWith(
      """qw_counts AS (
        |  SELECT date_trunc('hour', arrival_ts) AS hour_start, sink,
        |    least(49, greatest(0, CAST(floor(fare_amount / 10.0) AS INT))) AS bin,
        |    count(*) AS c
        |  FROM ev_routed WHERE fare_amount IS NOT NULL
        |  GROUP BY 1, 2, 3
        |), qw_agg AS (
        |  SELECT hour_start, sink, bin, c,
        |    sum(c) OVER (PARTITION BY hour_start, sink ORDER BY bin) AS cum,
        |    sum(c) OVER (PARTITION BY hour_start, sink) AS n
        |  FROM qw_counts
        |), qw_pick AS (
        |  SELECT *, row_number() OVER (PARTITION BY hour_start, sink
        |    ORDER BY bin) AS rn
        |  FROM qw_agg WHERE cum >= 0.5 * n)""".stripMargin,
      """SELECT hour_start, sink, CAST(n AS BIGINT) AS n,
        |  0.0::DOUBLE + 10.0::DOUBLE * bin
        |    + 10.0::DOUBLE * (0.5::DOUBLE * n - (cum - c)) / c AS est
        |FROM qw_pick WHERE rn = 1 ORDER BY hour_start, sink""".stripMargin),

    "stream_hopping_window" -> stream(
      """SELECT win_start, sink, count(*) AS events FROM (
        |  SELECT sink, unnest([
        |    CAST(to_timestamp(floor(epoch(arrival_ts) / 1800) * 1800) AS TIMESTAMP),
        |    CAST(to_timestamp(floor(epoch(arrival_ts) / 1800) * 1800 - 1800) AS TIMESTAMP)
        |  ]) AS win_start
        |  FROM ev_routed) x
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // the windows order by (arrival_ts, event_id), a TOTAL key: the
    // session structure is provably invariant to tie order (equal-ts
    // rows always extend the session), but DuckDB's parallel window
    // execution returned run-varying session counts at x20 (971/972/974
    // on identical input) when the sort key had ~20-way ts ties —
    // pinning the order removes the tie surface entirely; the engine's
    // session_window needs no order and matched every clean run
    "stream_session_window" -> stream(
      """SELECT min(arrival_ts) AS session_start,
        |  max(arrival_ts) + INTERVAL 10 MINUTE AS session_end,
        |  vendor_id, count(*) AS events
        |FROM (
        |  SELECT vendor_id, arrival_ts,
        |    sum(brk) OVER (PARTITION BY vendor_id
        |                   ORDER BY arrival_ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT vendor_id, arrival_ts, event_id,
        |      CASE WHEN arrival_ts < lag(arrival_ts) OVER (
        |             PARTITION BY vendor_id ORDER BY arrival_ts, event_id)
        |           + INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS brk
        |    FROM ev_routed WHERE vendor_id IS NOT NULL) m) s
        |GROUP BY vendor_id, sid
        |ORDER BY session_start, vendor_id""".stripMargin),

    "win_sessionize" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq,
        |  brk = 1 AS is_session_start
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |) m
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "late_data" -> stream(
      """SELECT c AS orig_rows, c AS after_replay_rows, true AS absorbed
        |FROM (SELECT count(*) AS c FROM ev_slice) t""".stripMargin),

    "agg_quantile_sketch" ->
      """WITH hist AS (
        |  SELECT event_type,
        |    least(49, greatest(0, CAST(floor((value - 0.0) / 10.0) AS INT)))
        |      AS bin,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), cumed AS (
        |  SELECT event_type, bin, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bin
        |                 ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM hist
        |), picked AS (
        |  SELECT event_type, CAST(n AS BIGINT) AS n,
        |    0.0::DOUBLE + 10.0::DOUBLE * bin
        |      + 10.0::DOUBLE * (0.5::DOUBLE * n - (cum - c)) / c AS est,
        |    row_number() OVER (PARTITION BY event_type ORDER BY bin) AS rn
        |  FROM cumed WHERE cum >= 0.5::DOUBLE * n
        |), exact AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS exact_p50
        |  FROM events GROUP BY 1)
        |SELECT p.event_type, p.n, p.est, x.exact_p50,
        |  abs(p.est - x.exact_p50) AS abs_err
        |FROM picked p JOIN exact x USING (event_type)
        |WHERE p.rn = 1 ORDER BY p.event_type""".stripMargin,

    "source_cdc_apply" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id
        |  FROM events
        |), snap AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us DESC, event_id DESC) AS rn
        |    FROM ev WHERE ts_us < 1705276800000000) s
        |  WHERE rn = 1
        |), chg AS (
        |  SELECT user_id, CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END
        |    AS op, event_type, value, ts_us, event_id
        |  FROM ev WHERE ts_us >= 1705276800000000
        |), merged AS (
        |  SELECT user_id, event_type, value, op,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY pri DESC, ts_us DESC, event_id DESC) AS rn
        |  FROM (
        |    SELECT user_id, event_type, value, 'S' AS op, 0 AS pri,
        |      NULL::BIGINT AS ts_us, NULL::BIGINT AS event_id FROM snap
        |    UNION ALL
        |    SELECT user_id, event_type, value, op, 1, ts_us, event_id FROM chg) u
        |)
        |SELECT user_id, event_type, value FROM merged
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id""".stripMargin,

    "scd2_history" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |    row_number() OVER w AS rn, lag(event_type) OVER w AS prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), versions AS (
        |  SELECT user_id, event_type, ts_us, event_id FROM ordered
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev
        |)
        |SELECT user_id, event_type, ts_us AS from_us,
        |  lead(ts_us) OVER w2 AS to_us,
        |  lead(ts_us) OVER w2 IS NULL AS is_current
        |FROM versions
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, from_us, event_type""".stripMargin)
}
