package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One static-threshold alert rule: a named windowed aggregate compared
  * against a threshold — the engine analog of a metric-alert criterion
  * (ref: infra/streaming-bicep/modules/alerts.bicep:32-56 — operator +
  * threshold + timeAggregation over a fixed evaluation window).
  * `greaterThan = false` means "fire when observed < threshold" (the
  * liveness shape: IncomingMessages LessThan 1). */
final case class AlertRule(
    name: String,
    severity: Int,
    measure: Column,
    greaterThan: Boolean,
    threshold: Double)

/** Windowed alert-rule evaluation — the monitoring semantics of the
  * reference's Azure Monitor rules (alerts.bicep: Event Hubs
  * incoming-drop, ASA output errors, storage 5xx — all PT15M static
  * thresholds), re-expressed as engine code so the result is a queryable
  * table instead of a paging webhook (the wiring an embedded library
  * correctly does not own).
  *
  * Every rule evaluates over EVERY window in the observed time range,
  * including EMPTY ones: a liveness rule ("no messages for 15 min")
  * fires precisely when a window has no rows, so the evaluation joins a
  * generated window SPINE (bounded by time-range/window, independent of
  * row count) against the aggregated windows and coalesces absent
  * measures to zero.
  *
  * Scale shape: ONE map-side-combined groupBy computes every rule's
  * aggregate in the same pass; the spine derives from a 1-row min/max
  * agg and broadcasts into the left join; per-rule rows come from an
  * exploded literal array — no second scan, no per-rule job. Windows
  * bucket by epoch-floor (identical to SQL floor(epoch/w)*w in any
  * engine, so results are oracle-checkable). */
object AlertRules {

  def evaluate(events: DataFrame, tsCol: String, windowMinutes: Int,
               rules: Seq[AlertRule]): DataFrame = {
    require(rules.nonEmpty, "at least one alert rule")
    val secs = windowMinutes * 60L
    val bucket = (floor(unix_timestamp(col(tsCol)) / secs) * secs).cast("long")
    val agged = events.groupBy(bucket.as("window_start_s"))
      .agg(rules.head.measure.as(rules.head.name),
        rules.tail.map(r => r.measure.as(r.name)): _*)
    val spine = events
      .agg((floor(unix_timestamp(min(col(tsCol))) / secs) * secs)
          .cast("long").as("lo"),
        (floor(unix_timestamp(max(col(tsCol))) / secs) * secs)
          .cast("long").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(secs)))
        .as("window_start_s"))
    val joined = spine.join(agged, Seq("window_start_s"), "left")
    val evals = array(rules.map { r =>
      val obs = coalesce(col(r.name).cast("double"), lit(0.0))
      struct(lit(r.name).as("rule"), lit(r.severity).as("severity"),
        obs.as("observed"), lit(r.threshold).as("threshold"),
        (if (r.greaterThan) obs > r.threshold else obs < r.threshold)
          .as("firing"))
    }: _*)
    joined.select(col("window_start_s"), explode(evals).as("e"))
      .select(col("window_start_s"), col("e.rule"), col("e.severity"),
        col("e.observed"), col("e.threshold"), col("e.firing"))
      .orderBy("window_start_s", "rule")
  }

  /** Streaming evaluation of the same rules over a watermarked windowed
    * aggregate — alerts fire as windows close instead of at batch
    * cadence. Covers every rule on OBSERVED windows; a pure append
    * stream has no row to hang an ABSENT window on, so the liveness-gap
    * half of the semantics (which [[evaluate]]'s spine provides) needs
    * either the batch sweep or a processing-time timer source — the
    * same split Azure Monitor itself makes between metric alerts and
    * scheduled-query rules. Identical measure expressions and rule
    * structs as the batch path; WindowedStatsSpec proves
    * streaming == batch on the emitted windows. */
  def evaluateStream(events: DataFrame, tsCol: String, windowMinutes: Int,
                     rules: Seq[AlertRule],
                     watermark: String = "2 hours"): DataFrame = {
    require(rules.nonEmpty, "at least one alert rule")
    val agged = events
      .withColumn("_evt", col(tsCol).cast("timestamp"))
      .withWatermark("_evt", watermark)
      .groupBy(window(col("_evt"), s"$windowMinutes minutes"))
      .agg(rules.head.measure.as(rules.head.name),
        rules.tail.map(r => r.measure.as(r.name)): _*)
    val evals = array(rules.map { r =>
      val obs = coalesce(col(r.name).cast("double"), lit(0.0))
      struct(lit(r.name).as("rule"), lit(r.severity).as("severity"),
        obs.as("observed"), lit(r.threshold).as("threshold"),
        (if (r.greaterThan) obs > r.threshold else obs < r.threshold)
          .as("firing"))
    }: _*)
    agged.select(
        unix_timestamp(col("window.start")).as("window_start_s"),
        explode(evals).as("e"))
      .select(col("window_start_s"), col("e.rule"), col("e.severity"),
        col("e.observed"), col("e.threshold"), col("e.firing"))
  }
}
