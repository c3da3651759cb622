package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{SegmentLog, SegmentLogOffset, SegmentLogProvider, SegmentLogStream}
import graft.stream.SegmentLogStreamSource

/** The DataSource V2 segment-log source: message-bus offset semantics
  * (monotonic offsets, reproducible batch planning, exactly-once resume
  * from the checkpoint) proven through real Structured Streaming runs. */
class SegmentLogSourceSpec extends SparkSpec {

  override def afterAll(): Unit = {
    spark.streams.active.foreach(_.stop())
    super.afterAll()
  }

  private def awaitDone(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    assert(q.awaitTermination(120000), s"stream finished in time")
    assert(q.exception.isEmpty, s"stream terminated cleanly: ${q.exception}")
  }

  private def writeSegment(dir: String, name: String, lines: Seq[String]): Unit = {
    // the producer protocol the source's visibility rule enables: stage
    // under a dot-name, rename in — a half-written segment is never read
    val tmp = Paths.get(dir, s".tmp-$name")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, name))
  }

  test("reads segments as offset ranges with per-record (segment, offset) ids") {
    val dir = tmpDir("seglog_read")
    writeSegment(dir, "0001.seg", Seq("a", "b"))
    writeSegment(dir, "0002.seg", Seq("c"))

    val out = tmpDir("seglog_read_out")
    val q = spark.readStream.format(classOf[SegmentLogProvider].getName)
      .option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)

    val got = spark.read.parquet(s"$out/data")
      .orderBy("segment", "offset")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("a", "0001.seg", 0L), ("b", "0001.seg", 1L), ("c", "0002.seg", 0L)))
  }

  test("exactly-once resume: a restart from the checkpoint reads only new segments") {
    val dir = tmpDir("seglog_resume")
    val out = tmpDir("seglog_resume_out")
    writeSegment(dir, "0001.seg", Seq("r1", "r2"))

    def run(): Unit = {
      val q = spark.readStream.format(classOf[SegmentLogProvider].getName)
        .option("path", dir).load()
        .writeStream.format("parquet")
        .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      awaitDone(q)
    }
    run()
    assert(spark.read.parquet(s"$out/data").count() == 2)

    // append beyond the committed offset, restart with the SAME checkpoint
    writeSegment(dir, "0002.seg", Seq("r3"))
    run()
    val all = spark.read.parquet(s"$out/data")
      .select("value").collect().map(_.getString(0)).sorted.toSeq
    assert(all == Seq("r1", "r2", "r3"),
      "each record delivered exactly once across the restart")
  }

  test("in-flight (dot/underscore) files are invisible until renamed in") {
    val dir = tmpDir("seglog_vis")
    writeSegment(dir, "0001.seg", Seq("ok"))
    Files.write(Paths.get(dir, ".tmp-half"), "torn".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir, "_marker"), "meta".getBytes(StandardCharsets.UTF_8))
    assert(SegmentLog.segments(dir).map(_.getFileName.toString) == Seq("0001.seg"))
  }

  test("a listing that shrank below the checkpointed position fails loudly " +
    "— never a backward offset (ADVICE r18)") {
    val dir = tmpDir("seglog_shrunk")
    writeSegment(dir, "0001.seg", Seq("a"))
    writeSegment(dir, "0002.seg", Seq("b"))
    val stream = new graft.sources.SegmentLogStream(dir, Some(1))
    // retention/manual cleanup deletes a segment under a live checkpoint
    // that already committed past it
    Files.delete(Paths.get(dir, "0002.seg"))
    val e = intercept[RuntimeException] {
      stream.latestOffset(SegmentLogOffset(2L, Some("0002.seg")),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles(1))
    }
    assert(e.getMessage.contains("shrank below the checkpointed position"),
      e.getMessage)
  }

  test("offsets are monotone counts + high-water names and round-trip their json form") {
    val dir = tmpDir("seglog_off")
    val stream = new graft.sources.SegmentLogStream(dir)
    assert(stream.latestOffset() == SegmentLogOffset(0L))
    writeSegment(dir, "0001.seg", Seq("x"))
    assert(stream.latestOffset() == SegmentLogOffset(1L, Some("0001.seg")))
    writeSegment(dir, "0002.seg", Seq("y"))
    assert(stream.latestOffset() == SegmentLogOffset(2L, Some("0002.seg")))
    val o = SegmentLogOffset(7L, Some("""we"ird\name.seg"""))
    assert(stream.deserializeOffset(o.json()) == o)
    // checkpoints from builds before the high-water field still parse
    assert(stream.deserializeOffset("""{"segments":3}""") == SegmentLogOffset(3L))
  }

  test("a segment name sorting before the consumed high-water fails the batch instead of remapping offsets") {
    val dir = tmpDir("seglog_misname")
    val stream = new graft.sources.SegmentLogStream(dir)
    writeSegment(dir, "9.seg", Seq("a"))
    val end1 = stream.latestOffset()
    assert(end1 == SegmentLogOffset(1L, Some("9.seg")))
    // consumed up to '9.seg'; a producer now publishes '10.seg' which
    // sorts BEFORE it — positional offsets would silently re-read '10.seg'
    // as if it were the consumed segment and skip real data
    writeSegment(dir, "10.seg", Seq("b"))
    val end2 = stream.latestOffset()
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(end1, end2)
    }
    assert(err.getMessage.contains("naming contract"))
    // a correctly-sorting name keeps planning healthy
    val dir2 = tmpDir("seglog_okname")
    val s2 = new graft.sources.SegmentLogStream(dir2)
    writeSegment(dir2, "0009.seg", Seq("a"))
    val e1 = s2.latestOffset()
    writeSegment(dir2, "0010.seg", Seq("b"))
    val parts = s2.planInputPartitions(e1, s2.latestOffset())
    assert(parts.length == 1)
  }

  test("the full 3-way ingest fan-out runs over the segment log, counts conserve") {
    val base = tmpDir("seglog_ingest")
    val dirs = graft.stream.Ingest.LakeDirs(
      s"$base/raw", s"$base/curated", s"$base/dlq", s"$base/ckpt")
    val segDir = tmpDir("seglog_ingest_log")
    val envs = graft.model.EventsModel.envelopes(spark, sf())
      .select("json").limit(200).collect().map(_.getString(0)).toSeq
    // two producer batches = two sealed segments
    writeSegment(segDir, "0001.seg", envs.take(120))
    writeSegment(segDir, "0002.seg", envs.drop(120))

    val q = graft.stream.Ingest.start(spark,
      SegmentLogStreamSource(segDir), dirs, Trigger.AvailableNow())
    awaitDone(q)

    val raw = spark.read.text(dirs.raw).count()
    val curated = spark.read
      .schema(graft.stream.HourLoad.curatedReadSchema)
      .option("header", "false").csv(dirs.curated).count()
    val dlq = spark.read.text(dirs.dlq).count()
    assert(raw == 200L, "raw sink is a full passthrough of the log")
    assert(curated + dlq == 200L, "curated + dlq partition the log")
    assert(curated > 0)
  }

  test("kill mid-batch + restart from checkpoint: exactly-once through ingest → stg → core") {
    // The broker contract end-to-end: segment log → 3-way ingest, killed
    // INSIDE a batch's sink-commit sequence (after raw committed, before
    // dlq), restarted from the same checkpoint, then the warehouse hour
    // loads — total row counts must come out exactly-once at every layer.
    val base = tmpDir("seglog_e2e")
    val dirs = graft.stream.Ingest.LakeDirs(
      s"$base/raw", s"$base/curated", s"$base/dlq", s"$base/ckpt")
    val segDir = tmpDir("seglog_e2e_log")
    val envs = graft.model.EventsModel.envelopes(spark, sf())
      .select("json").collect().map(_.getString(0)).toSeq
    val n = envs.length
    writeSegment(segDir, "0001.seg", envs.take(n / 2))
    writeSegment(segDir, "0002.seg", envs.drop(n / 2))

    // Block the THIRD sink of the batch: a regular file at the dlq root
    // makes its staging write fail after raw + curated already committed —
    // the crash lands inside writeBatch's per-sink commit window.
    Files.write(Paths.get(base, "dlq"), "blocker".getBytes(StandardCharsets.UTF_8))
    val q1 = graft.stream.Ingest.start(spark,
      SegmentLogStreamSource(segDir), dirs, Trigger.AvailableNow())
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination(120000)
    }
    assert(Files.exists(Paths.get(dirs.raw, "_graft_commits", "batch-0")),
      "crash window is real: raw committed its share of batch 0 before the kill")
    assert(!Files.isDirectory(Paths.get(dirs.dlq)), "dlq never materialized")

    // Operator fixes the sink, restarts from the SAME checkpoint: the
    // failed batch replays with its WAL offsets; committed sinks skip via
    // markers, the dlq share lands once.
    Files.delete(Paths.get(base, "dlq"))
    val q2 = graft.stream.Ingest.start(spark,
      SegmentLogStreamSource(segDir), dirs, Trigger.AvailableNow())
    awaitDone(q2)

    val rawDf = spark.read.text(dirs.raw)
    assert(rawDf.count() == n, "raw passthrough delivered exactly once")
    val curated = spark.read.schema(graft.stream.HourLoad.curatedReadSchema)
      .option("header", "false").csv(dirs.curated)
    val curatedN = curated.count()
    val dlqN = spark.read.text(dirs.dlq).count()
    assert(curatedN + dlqN == n, "curated + dlq partition the log exactly once")
    assert(curated.select("c_event_id").distinct().count() == curatedN,
      "no curated event delivered twice across the restart")

    // Warehouse micro-batches over the FIRST DAY's landed hours (the
    // fixture spans a month — a day of hourly loads proves the loop
    // without 480 micro-batch jobs): core ends exactly-once for that day
    val wh = graft.stream.HourLoad.Warehouse(spark, s"$base/wh")
    val allHours = spark.read.schema(graft.stream.HourLoad.curatedReadSchema)
      .option("header", "false").csv(dirs.curated)
      .select(regexp_extract(input_file_name(), "p_date=([0-9-]+)", 1).as("d"),
        regexp_extract(input_file_name(), "p_hour=([0-9]+)", 1).as("h"))
      .distinct().orderBy("d", "h").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val day0 = allHours.head._1
    val hours = allHours.filter(_._1 == day0)
    assert(hours.size > 1, "first day spans multiple hours")
    val day0N = curated
      .filter(input_file_name().contains(s"p_date=$day0/")).count()
    val results = hours.map { case (d, h) =>
      graft.stream.HourLoad.runHour(wh, dirs.curated, d, h, runId = s"$d-$h")
    }
    assert(results.map(_.inserted).sum == day0N,
      "every curated trip of the day inserted exactly once across the hour loads")
    assert(wh.core.read.count() == day0N)

    // replaying one hour with its original runId is absorbed: updates, no
    // inserts, core count unchanged
    val (d0, h0) = hours.head
    val replay = graft.stream.HourLoad.runHour(wh, dirs.curated, d0, h0,
      runId = s"$d0-$h0")
    assert(replay.inserted == 0 && replay.updated == replay.total)
    assert(wh.core.read.count() == day0N, "hour replay is a no-op on core")

    // a day of hourly loads appended one commit dir per hour to the audit
    // table (hours + the replay); maintenance compaction folds them to ONE
    // without changing a row — and the next hour load merges cleanly on top
    assert(wh.audit.liveCommitDirs == hours.size + 1)
    val auditN = wh.audit.read.count()
    wh.audit.compact()
    assert(wh.audit.liveCommitDirs == 1,
      "compaction folded the per-hour audit appends")
    assert(wh.audit.read.count() == auditN, "compaction is a logical no-op")
    val nextHours = allHours.filter(_._1 != day0).take(1)
    nextHours.foreach { case (d, h) =>
      val r = graft.stream.HourLoad.runHour(wh, dirs.curated, d, h, runId = s"$d-$h")
      assert(r.inserted > 0, "post-compaction hour load merges new rows")
    }
  }

  test("the StreamSource seam runs the full ingest wire over the segment log") {
    val dir = tmpDir("seglog_wire")
    val envs = graft.model.EventsModel.envelopes(spark, sf())
      .select("json").limit(50).collect().map(_.getString(0)).toSeq
    writeSegment(dir, "0001.seg", envs)

    val parsed = graft.stream.StreamTransforms.parse(
      SegmentLogStreamSource(dir).load(spark))
    val q = parsed.writeStream.format("memory").queryName("seglog_wire")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    assert(spark.table("seglog_wire").count() == 50,
      "all wire envelopes parse through the dual-key path")
  }

  // ------- admission control: maxSegmentsPerTrigger (VERDICT r17 #2) ----

  test("admission control plans ⌈N/k⌉ capped offset steps, each guarded by its own high-water name") {
    val dir = tmpDir("seglog_cap_plan")
    (1 to 10).foreach(i => writeSegment(dir, f"$i%04d.seg", Seq(s"r$i")))
    val stream = new SegmentLogStream(dir, Some(3))
    val limit = stream.getDefaultReadLimit
    // walk the planned chain exactly as the engine would
    var cur = stream.initialOffset()
    var steps = Seq.empty[(Long, Int)]
    var done = false
    while (!done) {
      val next = stream.latestOffset(cur, limit)
        .asInstanceOf[SegmentLogOffset]
      if (next.segments == cur.asInstanceOf[SegmentLogOffset].segments) done = true
      else {
        val planned = stream.planInputPartitions(cur, next)
        steps = steps :+ ((next.segments, planned.length))
        cur = next
      }
    }
    assert(steps == Seq((3L, 3), (6L, 3), (9L, 3), (10L, 1)),
      "a 10-segment backlog drains in ceil(10/3)=4 bounded batches")
    // the capped intermediate offsets carry their own high-water names
    val mid = stream.latestOffset(stream.initialOffset(), limit)
      .asInstanceOf[SegmentLogOffset]
    assert(mid.highWater.contains("0003.seg"))
    // the true tip is still reported for backlog telemetry
    assert(stream.reportLatestOffset()
      .asInstanceOf[SegmentLogOffset].segments == 10L)
  }

  test("maxSegmentsPerTrigger drains a backlog through the real engine in bounded batches, exactly once") {
    val dir = tmpDir("seglog_cap_run")
    val out = tmpDir("seglog_cap_out")
    (1 to 10).foreach(i =>
      writeSegment(dir, f"$i%04d.seg", Seq(s"a$i", s"b$i")))

    val q = spark.readStream.format(classOf[SegmentLogProvider].getName)
      .option("path", dir).option("maxSegmentsPerTrigger", "3").load()
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)

    // ceil(10/3) = 4 committed batches — the checkpoint's commit log is
    // the engine's own record of how the drain was sliced
    val batchIds = {
      val s = Files.list(Paths.get(s"$out/ckpt/commits"))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString)
        .filter(_.forall(_.isDigit)).toSeq.sorted
      finally s.close()
    }
    assert(batchIds == Seq("0", "1", "2", "3"),
      s"backlog drained in 4 bounded batches, got $batchIds")
    val got = spark.read.parquet(s"$out/data")
      .select("value").collect().map(_.getString(0)).sorted.toSeq
    assert(got == (1 to 10).flatMap(i => Seq(s"a$i", s"b$i")).sorted,
      "every record delivered exactly once across the capped batches")
  }

  test("a mid-drain kill/restart under the cap stays exactly-once") {
    val dir = tmpDir("seglog_cap_kill")
    val out = tmpDir("seglog_cap_kill_out")
    // 24 segments at cap 2 = 12 bounded batches: draining takes long
    // enough that a stop issued after the first committed rows reliably
    // lands MID-drain, not after it
    (1 to 24).foreach(i => writeSegment(dir, f"$i%04d.seg", Seq(f"v$i%02d")))

    def reader() = spark.readStream.format(classOf[SegmentLogProvider].getName)
      .option("path", dir).option("maxSegmentsPerTrigger", "2").load()

    def landed(): Long =
      try spark.read.schema("value STRING, segment STRING, offset BIGINT")
        .parquet(s"$out/data").count()
      catch { case _: Exception => 0L } // sink dir not initialized yet

    // phase 1: continuous trigger; stop as soon as SOME bounded batches
    // committed but before the backlog drained — a mid-drain 'crash'
    val q1 = reader().writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.ProcessingTime(25L)).start()
    val deadline = System.currentTimeMillis() + 120000
    while (landed() < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q1.stop()
    val partial = spark.read.parquet(s"$out/data").count()
    assert(partial >= 2 && partial < 24, s"stopped mid-drain (rows=$partial)")

    // phase 2: restart from the same checkpoint, drain whatever remains
    val q2 = reader().writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q2)
    val all = spark.read.parquet(s"$out/data")
      .select("value").collect().map(_.getString(0)).sorted.toSeq
    assert(all == (1 to 24).map(i => f"v$i%02d").sorted.toSeq,
      "each record exactly once across the mid-drain kill/restart")
  }
}
