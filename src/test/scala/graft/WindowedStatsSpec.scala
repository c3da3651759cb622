package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventsModel
import graft.stream.{StreamTransforms, WindowedStats}

/** Stateful streaming operators: watermarked windowed aggregation and
  * flatMapGroupsWithState dedupe, driven through a real file stream. */
class WindowedStatsSpec extends SparkSpec {

  override def afterAll(): Unit = {
    spark.streams.active.foreach(_.stop()) // never leave a query running
    super.afterAll()
  }

  /** awaitTermination that fails loudly: the query must finish within the
    * timeout AND terminate without an exception — a query that dies during
    * teardown (the round-1 deduped_stream NPE) must fail the suite. */
  private def awaitDone(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    assert(q.awaitTermination(120000), s"stream ${q.name} finished in time")
    assert(q.exception.isEmpty, s"stream ${q.name} terminated cleanly: ${q.exception}")
  }

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
    awaitDone(q)

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

  test("windowedQuantile: streaming == batch == the batch QuantileSketch per group") {
    val base = tmpDir("graft_winq")
    val input = s"$base/landing"
    EventsModel.envelopes(spark, sf()).select("json")
      .coalesce(2).write.mode("overwrite").text(input)

    def routedOf(df: org.apache.spark.sql.DataFrame) =
      StreamTransforms.route(StreamTransforms.enrich(StreamTransforms.parse(df)))
    def src(streaming: Boolean) = {
      val r = if (streaming)
        spark.readStream.text(input).withColumnRenamed("value", "json")
      else spark.read.text(input).withColumnRenamed("value", "json")
      routedOf(r.withColumn("arrival_ts",
        get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz")))
        .filter(col("fare_amount").isNotNull)
    }

    val q = WindowedStats.windowedQuantile(src(streaming = true),
        "fare_amount", 0.0, 500.0, 50, 0.5)
      .writeStream.format("memory").queryName("win_quant")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("win_quant")

    // 1. the same operator over the same data as a static frame
    val batch = WindowedStats.windowedQuantile(src(streaming = false),
      "fare_amount", 0.0, 500.0, 50, 0.5)
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty, "emitted windows match the batch run")

    // 2. mergeability: the independent batch sketch on (hour, sink) groups
    //    lands on the identical histogram → identical interpolated est
    val sketch = graft.ops.QuantileSketch.estimate(
        src(streaming = false)
          .withColumn("hour_start",
            date_trunc("hour", col("arrival_ts")).cast("timestamp_ntz")),
        Seq("hour_start", "sink"), "fare_amount", 0.0, 500.0, 50, 0.5)
      .select("hour_start", "sink", "n", "est")
    assert(got.exceptAll(sketch).isEmpty,
      "streaming per-micro-batch partials merge to the batch sketch exactly")
  }

  test("alert rules: streaming threshold evaluation equals the batch sweep") {
    val base = tmpDir("graft_alerts")
    val input = s"$base/landing"
    EventsModel.envelopes(spark, sf()).select("json")
      .coalesce(2).write.mode("overwrite").text(input)
    def routedOf(df: org.apache.spark.sql.DataFrame) =
      StreamTransforms.route(StreamTransforms.enrich(StreamTransforms.parse(df)))
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumnRenamed("value", "json").withColumn("arrival_ts",
        get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"))
    val rules = Seq(
      graft.ops.AlertRule("dlq-errors", 2,
        sum(when(col("sink") === "dlq", 1L).otherwise(0L)),
        greaterThan = true, 0.0), // the bicep rule: OutputError > 0
      graft.ops.AlertRule("incoming-drop", 3, count(lit(1)),
        greaterThan = false, 1.0))

    val q = graft.ops.AlertRules
      .evaluateStream(routedOf(withTs(spark.readStream.text(input))),
        "arrival_ts", 15, rules)
      .writeStream.format("memory").queryName("alert_eval")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("alert_eval")

    // the batch sweep covers min..max INCLUDING empty windows; every
    // window the stream emitted must match it value-for-value
    val batch = graft.ops.AlertRules
      .evaluate(routedOf(withTs(spark.read.text(input))), "arrival_ts", 15, rules)
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty,
      "streaming evaluations match the batch sweep")
    assert(got.filter(col("rule") === "dlq-errors" && col("firing")).count() > 0,
      "the error-threshold rule fires on the fixture's DLQ bursts")
  }

  test("vendorSessions: streaming session windows equal the batch answer") {
    val base = tmpDir("graft_sesswin")
    val input = s"$base/landing"
    EventsModel.envelopes(spark, sf()).select("json")
      .coalesce(2).write.mode("overwrite").text(input)

    def routedOf(df: org.apache.spark.sql.DataFrame) =
      StreamTransforms.route(StreamTransforms.enrich(StreamTransforms.parse(df)))
    def src(streaming: Boolean) = {
      val r = if (streaming) spark.readStream.text(input) else spark.read.text(input)
      r.withColumnRenamed("value", "json")
        .withColumn("arrival_ts",
          get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"))
    }

    val q = WindowedStats.vendorSessions(routedOf(src(streaming = true)), 10)
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDone(q)

    val got = spark.table("sess_win")
    val batch = WindowedStats.vendorSessions(routedOf(src(streaming = false)), 10)
    assert(got.count() > 0)
    // watermark may hold back trailing sessions in AvailableNow; every
    // emitted session must match the batch operator exactly
    assert(got.exceptAll(batch).isEmpty, "emitted sessions match batch")
    // sessions are disjoint per vendor and end = last event + gap
    val overlaps = batch.as("a").join(batch.as("b"),
      col("a.vendor_id") === col("b.vendor_id") &&
        col("a.session_start") < col("b.session_start") &&
        col("b.session_start") < col("a.session_end")).count()
    assert(overlaps == 0, "sessions never overlap within a vendor")
  }

  /** Streaming dedupe rig: CSV lines `trip_id,event_id,fare,ts` landed as
    * files (one micro-batch per file via maxFilesPerTrigger=1), through
    * [[WindowedStats.dedupeByTripId]] into a memory sink. */
  private def runDedupe(input: String, queryName: String,
                        ttl: java.time.Duration): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val q0 = spark.readStream.schema("v STRING")
      .option("maxFilesPerTrigger", 1).text(input)
      .select(split(col("v"), ",").as("p"))
      .select(col("p")(0).cast("long").as("trip_id"),
        col("p")(1).cast("long").as("event_id"),
        col("p")(2).cast("double").as("fare_amount"),
        col("p")(3).cast("timestamp").as("producer_ts"))
      .as[WindowedStats.KeyedEvent]
    val q = WindowedStats.dedupeByTripId(q0, ttl)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    awaitDone(q)
    spark.table(queryName)
  }

  private def land(input: String, mode: String, lines: Seq[String]): Unit = {
    import spark.implicits._
    lines.toDF("v").coalesce(1).write.mode(mode).text(input)
    Thread.sleep(20) // distinct mtimes keep the file-source batch order stable
  }

  test("intervalJoin: stream-stream join equals the batch join, bounded state") {
    import spark.implicits._
    val base = tmpDir("graft_ssjoin")
    // start/end event streams for the same trips; ends lag 5-200 minutes,
    // trip 7 ends outside the 120-minute bound, trip 9 never ends
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 08:00:00")
    def plus(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val starts = (1L to 10L).map(i => (i, plus(i))).toDF("trip_id", "start_ts")
    val ends = (1L to 10L).filter(_ != 9L)
      .map(i => (i, plus(i + (if (i == 7) 200 else 5 + i)))).toDF("trip_id", "end_ts")
    starts.write.mode("overwrite").parquet(s"$base/starts")
    ends.write.mode("overwrite").parquet(s"$base/ends")

    val sStream = spark.readStream.schema(starts.schema).parquet(s"$base/starts")
    val eStream = spark.readStream.schema(ends.schema).parquet(s"$base/ends")
    val q = WindowedStats.intervalJoin(sStream, eStream, 120)
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDone(q)

    val got = spark.table("ss_join")
    val batch = WindowedStats.intervalJoin(
      spark.read.parquet(s"$base/starts"), spark.read.parquet(s"$base/ends"), 120)
    assert(got.count() == 8, "trips 1-8 minus the out-of-bound 7, minus unmatched 9")
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stream-stream join equals the static join exactly")
    assert(!got.collect().map(_.getLong(0)).contains(7L), "200-min span exceeds the bound")
  }

  test("intervalJoinOuter: unmatched starts emit null-padded after the watermark") {
    import spark.implicits._
    val base = tmpDir("graft_ssjoin_outer")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 08:00:00")
    def plus(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    // trips 1-10 as in the inner case (7 out-of-bound, 9 never ends) PLUS
    // a late heartbeat start (trip 11, +240min): the global watermark is
    // the MIN across both streams, so without an event advancing the
    // START side past the eviction point, no null row could ever flush
    // in a bounded run — the heartbeat is the fix the scaladoc describes
    val starts = ((1L to 10L).map(i => (i, plus(i))) :+ (11L, plus(240)))
      .toDF("trip_id", "start_ts")
    val ends = (1L to 10L).filter(_ != 9L)
      .map(i => (i, plus(i + (if (i == 7) 200 else 5 + i)))).toDF("trip_id", "end_ts")
    starts.write.mode("overwrite").parquet(s"$base/starts")
    ends.write.mode("overwrite").parquet(s"$base/ends")

    val q = WindowedStats.intervalJoinOuter(
        spark.readStream.schema(starts.schema).parquet(s"$base/starts"),
        spark.readStream.schema(ends.schema).parquet(s"$base/ends"),
        120, delay = "10 minutes")
      .writeStream.format("memory").queryName("ss_join_outer")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDone(q)

    val got = spark.table("ss_join_outer")
    val matched = got.filter(col("matched"))
    val unmatched = got.filter(!col("matched"))
    assert(matched.count() == 8, "inner rows unchanged: trips 1-8 minus 7")
    assert(unmatched.select("trip_id").as[Long].collect().sorted.toSeq == Seq(7L, 9L),
      "out-of-bound 7 and never-ended 9 emit null-padded")
    assert(unmatched.filter(col("end_ts").isNotNull || col("span_min").isNotNull)
      .count() == 0, "unmatched rows carry NULL end/span")
    assert(got.filter(col("trip_id") === 11L).count() == 0,
      "the heartbeat itself stays in state — watermark never passes it")
  }

  test("dedupeWithinWatermark: built-in streaming dedup drops in-delay replays") {
    import spark.implicits._
    val base = tmpDir("graft_wmdedup")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 08:00:00")
    def plus(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    // trips 1-20, each replayed once 5 minutes later (inside the 2h delay)
    val rows = (1L to 20L).flatMap(i =>
      Seq((i, plus(i), i * 1.0), (i, plus(i + 5), i * 1.0)))
      .toDF("trip_id", "arrival_ts", "fare")
    rows.write.mode("overwrite").parquet(s"$base/in")
    val q = WindowedStats.dedupeWithinWatermark(
        spark.readStream.schema(rows.schema).parquet(s"$base/in"), "trip_id", "2 hours")
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("wm_dedup")
    assert(got.count() == 20, "each replayed trip emits exactly once")
    assert(got.select("trip_id").distinct().count() == 20)
  }

  test("dedupeByTripId: replays across micro-batches emit nothing") {
    val base = tmpDir("graft_statededupe")
    val input = s"$base/in"
    val t0 = "2024-01-01 00:00:00"
    // two landed files; maxFilesPerTrigger=1 forces them into separate
    // micro-batches of ONE query run, so suppression crosses batch
    // boundaries through the operator's state
    land(input, "overwrite", Seq.tabulate(100)(i => s"${i + 1},${i + 1},10.0,$t0"))
    land(input, "append", Seq.tabulate(50)(i => s"${i + 1},${i + 1001},99.0,$t0") ++
      Seq.tabulate(20)(i => s"${i + 101},${i + 101},10.0,$t0"))

    val rows = runDedupe(input, "deduped_stream", java.time.Duration.ofHours(2))
    assert(rows.count() == 120, "50 replays suppressed, 20 novel emitted")
    assert(rows.select("trip_id").distinct().count() == 120,
      "each trip id surfaced exactly once")
  }

  test("dedupeByTripId: event-time TTL expires state — late replay re-emits") {
    val base = tmpDir("graft_statededupe_ttl")
    val input = s"$base/in"
    // TTL = 1h of EVENT time. Batches: (1) id 1 @00:00 emits, timer 01:00;
    // (2) id 999 @03:00 emits + advances the watermark to 03:00;
    // (3) id 998 @03:00 emits, id 1's timer fires (03:00 > 01:00), state
    //     drops; (4) id 1 replay @03:30 finds no state → re-emitted.
    land(input, "overwrite", Seq("1,1,10.0,2024-01-01 00:00:00"))
    land(input, "append", Seq("999,999,1.0,2024-01-01 03:00:00"))
    land(input, "append", Seq("998,998,1.0,2024-01-01 03:00:00"))
    land(input, "append", Seq("1,2001,99.0,2024-01-01 03:30:00"))

    val rows = runDedupe(input, "deduped_ttl_stream", java.time.Duration.ofHours(1))
    assert(rows.count() == 4, "3 uniques + 1 beyond-TTL re-emission")
    assert(rows.filter(col("trip_id") === 1).count() == 2,
      "the beyond-TTL replay of trip 1 re-emits")
    assert(rows.filter(col("trip_id") === 1 && col("event_id") === 2001).count() == 1)
  }
}
