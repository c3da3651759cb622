package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.lambda.Lambda
import graft.model.EventsModel
import graft.stream.{HourLoad, Ingest, SegmentLogStreamSource}

/** The FULL composed path (VERDICT r16 #5): the broker contract and the
  * lambda star, previously proven piecewise (SegmentLogSourceSpec's
  * kill/restart, LambdaSpec's dual lanes on synthetic frames), run as ONE
  * pipeline — segment-log broker → 3-sink ingest (with a mid-stream
  * restart from the checkpoint) → hourly loads into the SHARED star WHILE
  * the batch lane replays its day against the same warehouse — with
  * exactly-once counts asserted at every layer:
  *
  *   broker records == raw rows == curated + dlq   (ingest, across restart)
  *   curated rows of each loaded hour == staged rows (CopyCuratedToStg)
  *   fresh slice keys == stream rows in core == stream rows in fact
  *   batch rows byte-conserved under concurrent replays
  *   one audit row per hour run; file-audit rows == blobs staged
  *
  * Reference analog: Event Hubs → ASA 3-output job → hourly warehouse
  * upsert procs while the daily ADF pipeline re-runs (asa-wire.sh plus
  * the sql/streaming and sql/batchELT procs) — the deployment's topology.
  */
class LambdaComposedE2ESpec extends SparkSpec {

  override def afterAll(): Unit = {
    spark.streams.active.foreach(_.stop())
    super.afterAll()
  }

  private def writeSegment(dir: String, name: String, lines: Seq[String]): Unit = {
    val tmp = Paths.get(dir, s".tmp-$name")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, name)): Unit
  }

  private def runIngest(logDir: String, dirs: Ingest.LakeDirs): Unit = {
    // admission control ON (maxSegmentsPerTrigger=1): every drain in the
    // composed topology slices per segment — the exactly-once counts below
    // hold with the production backlog cap in the path, not just uncapped
    val q = Ingest.start(spark,
      SegmentLogStreamSource(logDir, maxSegmentsPerTrigger = Some(1)), dirs,
      Trigger.AvailableNow())
    assert(q.awaitTermination(180000), "ingest leg finished in time")
    assert(q.exception.isEmpty, s"ingest leg clean: ${q.exception}")
  }

  test("composed e2e: broker → 3-sink ingest (restart mid-stream) → hour " +
      "loads into the SHARED star while the batch lane replays — " +
      "exactly-once counts at every layer") {
    val base = tmpDir("graft_composed")
    val logDir = s"$base/seglog"
    Files.createDirectories(Paths.get(logDir)): Unit
    val dirs = Ingest.LakeDirs(raw = s"$base/raw", curated = s"$base/curated",
      dlq = s"$base/dlq", checkpoint = s"$base/chk")

    // ---- producer: the event envelopes as broker segments. Segment 2
    // carries WIRE DRIFT (VERDICT r18 #4): a key the declared wire schema
    // has never seen, spliced into every envelope — the composition under
    // test is that it flows broker → ingest → curated → staging evolution
    // → shared star with NO operator step, while every exactly-once count
    // below still holds.
    val lines = EventsModel.envelopes(spark, sf()).select("json")
      .collect().map(_.getString(0)).toSeq
    val (seg1, seg2raw) = lines.splitAt(lines.length / 2)
    val seg2 = seg2raw.map(j =>
      j.patch(j.lastIndexOf('}'), ""","congestion_surcharge":"2.75"""", 0))
    writeSegment(logDir, "00000001.seg", seg1)

    // ---- ingest leg 1, then a BROKER-SIDE append + RESTART from the
    // same checkpoint (the kill/restart composition) ----
    runIngest(logDir, dirs)
    writeSegment(logDir, "00000002.seg", seg2)
    runIngest(logDir, dirs)

    // layer 1 — broker → raw: every record exactly once ACROSS the restart
    val rawRows = spark.read.text(dirs.raw).count()
    assert(rawRows == lines.length.toLong,
      s"raw passthrough == broker records (got $rawRows vs ${lines.length})")
    // layer 2 — routing conserves: curated + dlq == raw
    val curated = spark.read.schema(HourLoad.curatedReadSchema)
      .option("header", "false").csv(dirs.curated)
      .withColumn("_d", regexp_extract(input_file_name(), "p_date=([0-9-]+)", 1))
      .withColumn("_h", regexp_extract(input_file_name(), "p_hour=([0-9]+)", 1))
      .cache()
    val curatedRows = curated.count()
    val dlqRows = spark.read.text(dirs.dlq).count()
    assert(curatedRows + dlqRows == rawRows,
      s"3-way routing conserves ($curatedRows + $dlqRows == $rawRows)")
    assert(curatedRows > 0 && dlqRows > 0, "both routes exercised")

    // ---- the shared star: stream lane loads the 3 busiest hours WHILE
    // the batch lane replays its day against the same warehouse ----
    val wh = Lambda.SharedWarehouse(spark, s"$base/wh")
    val (bCore, _) = Lambda.runDaily(wh, sf(), "compose-seed")
    // load 2 busiest DRIFT-carrying hours + the busiest drift-free hour
    // (when one exists): the star must evolve on the former and the
    // latter's rows must read the evolved column as NULL
    val byHour = curated.groupBy("_d", "_h")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_extras").isNotNull, 1L).otherwise(0L)).as("drift"))
      .orderBy(col("n").desc, col("_d"), col("_h"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2), r.getLong(3))).toSeq
    val driftHours = byHour.filter(_._3 > 0).map(_._1)
    val cleanHours = byHour.filter(_._3 == 0).map(_._1)
    assert(driftHours.nonEmpty, "segment 2's drift reached the curated lake")
    val topHours =
      (driftHours.take(2) ++ cleanHours.take(1) ++ driftHours.drop(2)).take(3)
    val hourRows = curated.filter(
      concat_ws("/", col("_d"), col("_h")).isin(
        topHours.map { case (d, h) => s"$d/$h" }: _*)).count()

    val replayErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val replays = new Thread(() =>
      try (1 to 2).foreach(i => Lambda.runDaily(wh, sf(), s"compose-replay-$i"))
      catch { case t: Throwable => replayErr.set(t) }, "compose-batch-replays")
    replays.start()
    val results = topHours.map { case (d, h) =>
      Lambda.runHour(wh, dirs.curated, d, h, s"cmp-$d-$h")
    }
    replays.join(600000)
    assert(!replays.isAlive && replayErr.get() == null,
      s"batch replays completed under contention: ${replayErr.get()}")

    // layer 3 — curated → staging: per-hour copy counts are exact
    assert(results.map(_.rowsCopied).sum == hourRows,
      "CopyCuratedToStg copied each curated row of the loaded hours once")
    // layer 4 — slice → core/fact MERGE: fresh hours only insert; every
    // key exactly once in BOTH shared tables
    val streamCore = wh.core.read.filter(col("trip_id").isNotNull).cache()
    assert(results.forall(r => r.updated == 0 && r.inserted > 0),
      s"fresh hours only insert: $results")
    assert(streamCore.count() == results.map(_.inserted).sum,
      "stream rows in core == keys merged across the 3 hour loads")
    assert(streamCore.select("trip_id").distinct().count() == streamCore.count(),
      "stream keys unique in the shared core")
    assert(wh.fact.read.filter(length(col("trip_id")) < 64).count() ==
      streamCore.count(), "stream rows in fact == stream rows in core")
    // layer 5 — the batch lane's rows byte-conserved under its replays
    assert(wh.core.read.filter(col("trip_id").isNull).count() == bCore,
      "batch rows conserved across concurrent replays")
    // layer 6 — audit: one row per hour run; file audit == blobs staged
    val runIds = topHours.map { case (d, h) => s"cmp-$d-$h" }
    assert(wh.audit.read.filter(col("run_id").isin(runIds: _*)).count() ==
      topHours.size.toLong, "one audit row per hour run")
    assert(wh.fileAudit.read.filter(col("run_id").isin(runIds: _*)).count() ==
      results.map(_.files).sum, "one file-audit row per staged blob")
    // layer 7 — WIRE DRIFT through the whole composition (VERDICT r18
    // #4): the unknown key ingest captured (c_extras) became a real
    // staging/core column via additive evolution inside the hour loads —
    // no operator step anywhere on the path
    val driftCurated = curated.filter(col("c_extras").isNotNull).count()
    assert(driftCurated > 0 && driftCurated < curatedRows,
      s"drift rows are a proper curated subset ($driftCurated/$curatedRows)")
    assert(wh.stg.currentSchema.fieldNames.contains("x_congestion_surcharge"),
      "staging evolved additively from the wire")
    assert(wh.core.currentSchema.fieldNames.contains("x_congestion_surcharge"),
      "the shared core evolved additively from the wire")
    val coreAll = wh.core.read.cache()
    val coreDrift = coreAll.filter(col("x_congestion_surcharge").isNotNull)
    assert(coreDrift.count() > 0, "wire values landed in the shared core")
    assert(coreDrift.filter(col("x_congestion_surcharge") =!= "2.75")
      .count() == 0, "the wire value round-trips exactly")
    assert(coreDrift.filter(col("trip_id").isNull).count() == 0,
      "only stream-lane rows carry the wire value")
    // pre-drift rows read NULL: every batch-lane row predates the column,
    // and (when a drift-free hour was loaded) so do its stream rows
    assert(coreAll.filter(col("trip_id").isNull)
      .filter(col("x_congestion_surcharge").isNotNull).count() == 0,
      "pre-drift batch rows read NULL through the evolved schema")
    if (topHours.exists(cleanHours.contains)) {
      assert(coreAll.filter(col("trip_id").isNotNull)
        .filter(col("x_congestion_surcharge").isNull).count() > 0,
        "the drift-free hour's stream rows read NULL too")
    }
    coreAll.unpersist(): Unit

    // BI reconciliation across the composed star
    val factFare = wh.fact.read
      .agg(sum(col("fare_amount").cast("decimal(18,6)"))).collect()(0).getDecimal(0)
    val biFare = Lambda.biView(wh)
      .agg(sum(col("fare_amount").cast("decimal(18,6)"))).collect()(0).getDecimal(0)
    assert(factFare.compareTo(biFare) == 0, "BI view preserves the measure")
    curated.unpersist(); streamCore.unpersist(): Unit
  }
}
