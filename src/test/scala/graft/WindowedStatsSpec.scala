package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventsModel
import graft.stream.{StreamTransforms, WindowedStats}

/** Stateful streaming operators: watermarked windowed aggregation and
  * flatMapGroupsWithState dedupe, driven through a real file stream. */
class WindowedStatsSpec extends SparkSpec {

  test("hourlyQualityCounts: streaming windowed agg equals the batch answer") {
    val base = tmpDir("graft_winagg")
    val input = s"$base/landing"
    EventsModel.envelopes(spark, sf()).select("json")
      .coalesce(2).write.mode("overwrite").text(input)

    def routedOf(df: org.apache.spark.sql.DataFrame) =
      StreamTransforms.route(StreamTransforms.enrich(StreamTransforms.parse(df)))

    // streaming: file source → windowed agg → complete results to memory
    val stream = spark.readStream.text(input).withColumnRenamed("value", "json")
      .withColumn("arrival_ts",
        get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"))
    val q = WindowedStats.hourlyQualityCounts(routedOf(stream))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("win_counts")
      .select("hour_start", "sink", "events")
    // batch answer over the same data (same operator, static frame)
    val batch = routedOf(
      spark.read.text(input).withColumnRenamed("value", "json")
        .withColumn("arrival_ts",
          get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz")))
      .groupBy(date_trunc("hour", col("arrival_ts")).as("hour_start"), col("sink"))
      .agg(count(lit(1)).as("events"))
    // watermark may hold back the final (max-event-time) windows in
    // AvailableNow; everything emitted must match the batch answer exactly
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty, "emitted windows match batch")
  }

  test("dedupeByTripId: replays across micro-batches emit nothing") {
    import spark.implicits._
    val base = tmpDir("graft_statededupe")
    val input = s"$base/in"
    // two landed files; maxFilesPerTrigger=1 forces them into separate
    // micro-batches of ONE query run, so suppression crosses batch
    // boundaries through the operator's state
    Seq.tabulate(100)(i => s"${i + 1},${i + 1},10.0").toDF("v")
      .coalesce(1).write.mode("overwrite").text(input)
    (Seq.tabulate(50)(i => s"${i + 1},${i + 1001},99.0") ++
      Seq.tabulate(20)(i => s"${i + 101},${i + 101},10.0"))
      .toDF("v").coalesce(1).write.mode("append").text(input)

    val q0 = spark.readStream.schema("v STRING")
      .option("maxFilesPerTrigger", 1).text(input)
      .select(split(col("v"), ",").as("p"))
      .select(col("p")(0).cast("long").as("trip_id"),
        col("p")(1).cast("long").as("event_id"),
        col("p")(2).cast("double").as("fare_amount"))
      .as[WindowedStats.KeyedEvent]
    WindowedStats.dedupeByTripId(q0)
      .writeStream.format("memory").queryName("deduped_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination(120000)

    val rows = spark.table("deduped_stream")
    assert(rows.count() == 120, "50 replays suppressed, 20 novel emitted")
    assert(rows.select("trip_id").distinct().count() == 120,
      "each trip id surfaced exactly once")
  }
}
