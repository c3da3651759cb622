package graft.stream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Stateful Structured Streaming operators beyond the reference's hot path
  * (which is stateless by design — SURVEY §2.8): event-time windowed
  * aggregation with a watermark, and keyed streaming dedupe with
  * `flatMapGroupsWithState`.
  *
  * The reference absorbs late/replayed data with idempotent keyed merges
  * at the warehouse ([[HourLoad]]); these operators are the *in-stream*
  * alternatives when consumers need exactly-once effects or windowed
  * stats before the warehouse hop. State is per-key-bounded (one boolean
  * per trip id with a processing-time TTL; one row per open window), so
  * executors hold O(active keys), not O(stream).
  */
object WindowedStats {

  /** Tumbling 1-hour event-time quality stats with a 2-hour watermark:
    * per (window, sink) event counts — the windowed-agg form of the DLQ
    * audit. Works identically on static frames (tests/oracle) and
    * streaming frames (late rows beyond the watermark are dropped). */
  def hourlyQualityCounts(routed: DataFrame): DataFrame =
    routed
      // watermarks require a tz-aware event-time column; session is UTC so
      // the cast is value-preserving
      .withColumn("_evt", col("arrival_ts").cast("timestamp"))
      .withWatermark("_evt", "2 hours")
      .groupBy(window(col("_evt"), "1 hour"), col("sink"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("sink"), col("events"))

  /** Windowed mergeable quantile — [[graft.ops.QuantileSketch]]'s
    * fixed-bin histogram estimate as a SINGLE watermarked streaming
    * aggregation: per (1-hour window, sink), `bins` conditional-sum
    * counters accumulate in one agg (streaming forbids the batch
    * helper's second assembly aggregation; the counters are the O(bins)
    * mergeable state, exactly what t-digest/KLL would carry), and the
    * q-quantile is interpolated from the in-row histogram by a stateless
    * post-projection. Same static/streaming duality as the other windowed
    * ops — WindowedStatsSpec pins streaming == batch == the batch
    * QuantileSketch on the same groups, which is the mergeability proof:
    * partial per-micro-batch states land on the identical histogram.
    *
    * Estimation error ≤ one bin width by construction; out-of-domain
    * values clamp into the edge bins. */
  def windowedQuantile(routed: DataFrame, valueCol: String, lo: Double,
                       hi: Double, bins: Int, q: Double): DataFrame = {
    require(bins > 0 && hi > lo && q > 0 && q < 1,
      "need bins > 0, hi > lo, 0 < q < 1")
    val w = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lo) / w).cast("int")))
    val counters = (0 until bins).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"_b$b"))
    val agged = routed
      .withColumn("_evt", col("arrival_ts").cast("timestamp"))
      .withWatermark("_evt", "2 hours")
      .groupBy(window(col("_evt"), "1 hour"), col("sink"))
      .agg(counters.head, counters.tail: _*)
    val hist = array((0 until bins).map(b => col(s"_b$b")): _*)
    // stateless assembly: cumulative counts over the in-row histogram
    // (O(bins^2) adds per row — bins is a small constant), first bin with
    // cum >= q*n owns the quantile, linear interpolation inside it
    agged
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("sink"), hist.as("_h"))
      .withColumn("n", aggregate(col("_h"), lit(0L), (a, x) => a + x))
      .withColumn("_cum", transform(sequence(lit(0), lit(bins - 1)),
        i => aggregate(slice(col("_h"), lit(1), i + 1), lit(0L), (a, x) => a + x)))
      .withColumn("_target", lit(q) * col("n"))
      .withColumn("_bin", aggregate(sequence(lit(bins - 1), lit(0), lit(-1)),
        lit(bins - 1),
        (acc, i) => when(element_at(col("_cum"), i + 1) >= col("_target"), i)
          .otherwise(acc)))
      .withColumn("_c", element_at(col("_h"), col("_bin") + 1))
      .withColumn("_before",
        element_at(col("_cum"), col("_bin") + 1) - col("_c"))
      .select(col("hour_start"), col("sink"), col("n"),
        // every term is dyadic (integer counts, q*n, one IEEE divide) —
        // both engines hit the identical bits, so NO rounding: round(d, 12)
        // is itself the portability hazard (Spark rounds the shortest
        // decimal repr, DuckDB the exact binary value)
        (lit(lo) + lit(w) * col("_bin") +
          lit(w) * (col("_target") - col("_before")) / col("_c")).as("est"))
  }

  /** Hopping (sliding) window counts — the ASA `HoppingWindow(hour, 1,
    * minute, 30)` analog: every event lands in size/slide = 2 overlapping
    * windows. Same static/streaming duality as [[hourlyQualityCounts]]. */
  def hoppingQualityCounts(routed: DataFrame): DataFrame =
    routed
      .withColumn("_evt", col("arrival_ts").cast("timestamp"))
      .withWatermark("_evt", "2 hours")
      .groupBy(window(col("_evt"), "1 hour", "30 minutes"), col("sink"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").cast("timestamp_ntz").as("win_start"),
        col("sink"), col("events"))

  /** Per-vendor session windows — the ASA `SessionWindow` analog: an
    * event within `gapMinutes` of the session's last event extends it;
    * session end = last event + gap. State per open session only. */
  def vendorSessions(routed: DataFrame, gapMinutes: Int): DataFrame =
    routed
      .filter(col("vendor_id").isNotNull)
      .withColumn("_evt", col("arrival_ts").cast("timestamp"))
      .withWatermark("_evt", "2 hours")
      .groupBy(session_window(col("_evt"), s"$gapMinutes minutes"), col("vendor_id"))
      .agg(count(lit(1)).as("events"))
      .select(col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("vendor_id"), col("events"))

  /** Built-in watermarked streaming dedup — the engine-provided sibling
    * of [[dedupeByTripId]]: `dropDuplicatesWithinWatermark` keeps a key's
    * state only for the watermark delay, so replays inside the delay are
    * dropped and state is bounded without custom
    * flatMapGroupsWithState code. Trade-off vs the custom op: eviction
    * timing is engine-managed (no per-key TTL policy), and a replay
    * arriving after the delay re-emits — same contract the custom op's
    * event-time TTL spec pins. */
  def dedupeWithinWatermark(events: DataFrame, keyCol: String,
                            delay: String): DataFrame =
    events
      .withColumn("_evt", col("arrival_ts").cast("timestamp"))
      .withWatermark("_evt", delay)
      .dropDuplicatesWithinWatermark(keyCol)
      .drop("_evt")

  /** Stream-stream interval join — the two-stream correlation ASA spells
    * `JOIN ... ON a.id = b.id AND DATEDIFF(minute, a, b) BETWEEN 0 AND n`:
    * a start event joins the matching end event arriving within
    * `maxSpanMinutes`. Both sides carry watermarks AND the join condition
    * bounds the time skew, so the state store provably discards a row
    * once `watermark > ts + span` — bounded state at any stream length
    * (without the bound, stream-stream join state grows forever).
    * Inner-join rows emit as soon as both sides arrive; the watermark
    * only gates state eviction. Works identically on static frames. */
  def intervalJoin(starts: DataFrame, ends: DataFrame,
                   maxSpanMinutes: Int): DataFrame = {
    val s = starts.withColumn("start_ts", col("start_ts").cast("timestamp"))
      .withWatermark("start_ts", "2 hours").as("s")
    val e = ends.withColumn("end_ts", col("end_ts").cast("timestamp"))
      .withWatermark("end_ts", "2 hours").as("e")
    s.join(e,
      col("s.trip_id") === col("e.trip_id") &&
        col("e.end_ts") >= col("s.start_ts") &&
        col("e.end_ts") <= col("s.start_ts") + expr(s"interval $maxSpanMinutes minutes"))
      .select(col("s.trip_id").as("trip_id"),
        col("s.start_ts").cast("timestamp_ntz").as("start_ts"),
        col("e.end_ts").cast("timestamp_ntz").as("end_ts"),
        ((col("e.end_ts").cast("long") - col("s.start_ts").cast("long")) / 60)
          .cast("long").as("span_min"))
  }

  /** LEFT OUTER stream-stream interval join — [[intervalJoin]] plus the
    * rows it silently drops: a start whose end never arrives (or arrives
    * outside the span bound) emits with a NULL end. The semantics class
    * is genuinely different from inner: a null-padded row can only emit
    * once the engine PROVES no match can still arrive, i.e. when the
    * GLOBAL watermark (the min across both streams) passes
    * `start_ts + span`, so emission timing is watermark-driven, not
    * arrival-driven. Two operational consequences the spec pins: (a) the
    * watermark `delay` bounds both state size and null-row latency;
    * (b) a bounded run only flushes unmatched rows if some event
    * advances BOTH streams' watermarks far enough — a stalled side holds
    * the global watermark back (the min-policy), which is exactly the
    * production behavior to design heartbeats around. */
  def intervalJoinOuter(starts: DataFrame, ends: DataFrame,
                        maxSpanMinutes: Int,
                        delay: String = "2 hours"): DataFrame = {
    val s = starts.withColumn("start_ts", col("start_ts").cast("timestamp"))
      .withWatermark("start_ts", delay).as("s")
    val e = ends.withColumn("end_ts", col("end_ts").cast("timestamp"))
      .withWatermark("end_ts", delay).as("e")
    s.join(e,
        col("s.trip_id") === col("e.trip_id") &&
          col("e.end_ts") >= col("s.start_ts") &&
          col("e.end_ts") <= col("s.start_ts") + expr(s"interval $maxSpanMinutes minutes"),
        "left_outer")
      .select(col("s.trip_id").as("trip_id"),
        col("s.start_ts").cast("timestamp_ntz").as("start_ts"),
        col("e.end_ts").cast("timestamp_ntz").as("end_ts"),
        ((col("e.end_ts").cast("long") - col("s.start_ts").cast("long")) / 60)
          .cast("long").as("span_min"),
        col("e.end_ts").isNotNull.as("matched"))
  }

  final case class KeyedEvent(trip_id: Long, event_id: Long, fare_amount: Double,
                              producer_ts: java.sql.Timestamp)

  /** Streaming first-wins dedupe by deterministic key: state = "seen"
    * flag per trip_id with an EVENT-TIME TTL (the streaming analog of
    * `win_dedupe_stream`; replays in later micro-batches emit nothing).
    *
    * The TTL is watermark-driven, not wall-clock: a key's state expires
    * once the watermark passes `producer_ts + ttl`, so (a) state size is
    * bounded by the replay horizon regardless of stream volume, (b)
    * expiry is deterministic and replayable — the same input always
    * dedupes the same way, and (c) bounded replays (Trigger.AvailableNow
    * backfills) terminate: a processing-time TTL would keep the query
    * alive firing empty maintenance micro-batches until wall-clock timers
    * lapse (observed: hundreds of empty batches), where an event-time
    * timer fires as soon as the data itself moves the watermark past it.
    *
    * `disorder` is the tolerated out-of-orderness ACROSS micro-batches,
    * decoupled from the dedupe TTL: the watermark trails max(producer_ts)
    * by this delay, and `flatMapGroupsWithState` DROPS (not dedupes) any
    * input row whose producer_ts is older than the watermark — a NOVEL
    * event arriving later than `disorder` behind the stream head is
    * silently discarded, never emitted. Size it to the producer's real
    * disorder bound (the reference's ASA job tolerates late arrival up to
    * its hour boundary); `Duration.ZERO` restores drop-anything-late. */
  def dedupeByTripId(events: Dataset[KeyedEvent],
                     ttl: java.time.Duration = java.time.Duration.ofHours(2),
                     disorder: java.time.Duration = java.time.Duration.ofMinutes(10)): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("producer_ts", s"${disorder.getSeconds} seconds")
      .groupByKey(_.trip_id)
      .flatMapGroupsWithState[Boolean, KeyedEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[KeyedEvent], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // replay of a seen key
          else {
            val first = rows.next() // first occurrence wins
            state.update(true)
            state.setTimeoutTimestamp(first.producer_ts.getTime + ttl.toMillis)
            Iterator.single(first)
          }
      }
  }
}
