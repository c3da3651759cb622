package graft

import org.apache.spark.sql.functions._

import graft.batch.Runner
import graft.model.TaxiModel
import graft.ops.RunLog
import graft.quality.Checks
import graft.quality.Checks.DqGateException

/** Batch-lane e2e: the daily DAG over the sf0.001 lake, conservation
  * invariants (SURVEY §5), persisted ops tables, and gate fail-stop. */
class RunnerSpec extends SparkSpec {

  /** Read a warehouse table through its snapshot manifest (the table root
    * also holds superseded commit dirs — raw root reads would double). */
  private def readWh(wh: String, name: String) =
    spark.read.parquet(
      graft.ops.SnapshotTable.latestDataDirs(spark, s"$wh/$name").get: _*)

  test("runDaily: stg→core→mdl with all gates green and invariants held") {
    val wh = tmpDir("graft_batch_wh")
    val runner = Runner(spark, wh)
    val (coreRows, factRows) = runner.runDaily(sf(), "run-e2e-1")

    val stg = readWh(wh, "stg_trip")
    val core = readWh(wh, "core_trip_clean")
    val err = readWh(wh, "err_trip")
    val fact = readWh(wh, "fact_trip")

    assert(coreRows > 0 && factRows == coreRows)
    // conservation: core + err ≤ stg (dupes removed by dedupe)
    assert(core.count() + err.count() <= stg.count())
    // clean-domain invariants inside core
    assert(core.filter(col("fare_amount") < 0).count() == 0)
    assert(core.filter(col("pickup_ts_utc").isNull).count() == 0)
    // fact fare reconciles with core exactly
    val cf = core.agg(sum(col("fare_amount").cast("decimal(18,6)"))).collect()(0).getDecimal(0)
    val ff = fact.agg(sum(col("fare_amount").cast("decimal(18,6)"))).collect()(0).getDecimal(0)
    assert(cf.compareTo(ff) == 0)
    // every fact FK resolved or the -1 unknown member
    assert(fact.filter(col("vendor_sk") < -1).count() == 0)

    // post-load stats refresh (45_postload_stats.sql analog): the catalog
    // carries table- and column-level statistics for the six fact keys
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("fact_trip"))
    assert(meta.stats.exists(_.rowCount.exists(_.toLong == factRows)),
      s"catalog rowcount stat matches the load: ${meta.stats}")
    val colStats = meta.stats.get.colStats
    graft.batch.Maintenance.StatsTargets("fact_trip").foreach(c =>
      assert(colStats.get(c).exists(_.distinctCount.isDefined),
        s"column stat (NDV) present for $c"))
    // broadcast planning survives the analyzed table: a small dim against
    // the cataloged fact still plans a broadcast join
    locally {
      import spark.implicits._
      val dim = Seq((1, "resolved"), (-1, "unknown")).toDF("vendor_sk", "vendor_label")
      val jp = spark.table("fact_trip").join(dim, Seq("vendor_sk"))
        .queryExecution.executedPlan.toString
      assert(jp.contains("BroadcastHashJoin"), s"dim still broadcasts:\n${jp.take(1200)}")
    }

    // ops surface persisted (4 stages: raw→stg, stg→core, core→mdl, stats)
    val runLog = runner.log.runLog.read
    assert(runLog.filter(col("status") === "SUCCEEDED").count() == 4)
    val dq = runner.log.dqResult.read
    assert(dq.filter(col("status") === "FAILED").count() == 0)
    assert(dq.count() >= 12)
    // the full 8-check ModelDQ gate (50_dq_modeling.sql:26-42) persisted
    // under the reference check names, with the reference severities
    val mdl = dq.filter(col("stage") === "core_to_mdl").collect()
      .map(r => r.getString(2) -> r.getString(3)).toMap
    assert(mdl.keySet == Set("rowcount_fact_eq_core", "sum_fare_matches_core",
      "unknown_vendor_eq_0", "unknown_payment_eq_0", "unknown_rate_eq_0",
      "unknown_flag_eq_0", "unknown_pu_eq_0", "unknown_do_eq_0"))
    assert(mdl("rowcount_fact_eq_core") == "PASSED")
    assert(mdl("sum_fare_matches_core") == "PASSED")
    assert(mdl("unknown_pu_eq_0") == "PASSED" && mdl("unknown_do_eq_0") == "PASSED")
    // fixtures carry blank vendors and VOID/XX payments → warn, not fail
    assert(mdl("unknown_vendor_eq_0") == "WARNING")
    assert(mdl("unknown_payment_eq_0") == "WARNING")
    assert(runner.log.runMetrics.read.count() == 1)

    // rerun is idempotent (CTAS-style slice rebuild)
    val (coreRows2, factRows2) = runner.runDaily(sf(), "run-e2e-2")
    assert(coreRows2 == coreRows && factRows2 == factRows)
  }

  test("DQ gate persists FAILED rows then throws with the stage code") {
    val wh = tmpDir("graft_gate_wh")
    val log = RunLog(spark, wh)
    val ex = intercept[DqGateException] {
      Checks.gate(log, "run-x", "stg_to_core", 53000, Seq(
        Checks.failIfAny("no_negative_fare", 7),
        Checks.warnIfAny("negative_fare_warnonly", 3),
        Checks.failIfEmpty("rowcount_gt_0", 100)))
    }
    assert(ex.code == 53000 && ex.failed == Seq("no_negative_fare"))
    val rows = log.dqResult.read.collect()
    assert(rows.length == 3)
    val byName = rows.map(r => r.getString(2) -> r.getString(3)).toMap
    assert(byName("no_negative_fare") == "FAILED")
    assert(byName("negative_fare_warnonly") == "WARNING")
    assert(byName("rowcount_gt_0") == "PASSED")
    assert(log.runLog.read.filter(col("status") === "FAILED").count() == 1)
  }

  test("ModelDQ THROW-54000 fires on an unknown PU location") {
    val wh = tmpDir("graft_mdl_gate_wh")
    val log = RunLog(spark, wh)
    val fare = new java.math.BigDecimal("100.000000")
    val ex = intercept[DqGateException] {
      Checks.gate(log, "run-pu", "core_to_mdl", 54000,
        Runner.modelDqChecks(coreRows = 10, factRows = 10,
          coreFare = fare, factFare = fare,
          uVendor = 0, uPayment = 0, uRate = 0, uFlag = 0, uPu = 3, uDo = 0))
    }
    assert(ex.code == 54000 && ex.failed == Seq("unknown_pu_eq_0"))
    // all 8 rows persisted even on the failing run
    val rows = log.dqResult.read.filter(col("run_id") === "run-pu").collect()
    assert(rows.length == 8)
    assert(rows.map(r => r.getString(2) -> r.getString(3)).toMap
      .apply("unknown_pu_eq_0") == "FAILED")
  }

  test("dim upsert appends only novel NKs and never reuses an SK") {
    val deduped = TaxiModel.deduped(TaxiModel.cleaned(
      TaxiModel.tripsWithDups(spark, sf()), TaxiModel.paymentTypeMap(spark)))
    val existing = graft.batch.StarModel
      .dim(deduped.filter(col("ingest_date") < "1996-01-01"),
        "vendor_code", "vendor_nk", "vendor_sk")
    val upserted = graft.batch.StarModel.upsertDim(
      existing, deduped, "vendor_code", "vendor_nk", "vendor_sk")
    val before = existing.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val after = upserted.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // existing keep their SKs; novel get fresh ones above max
    before.foreach { case (nk, sk) => assert(after(nk) == sk) }
    assert(after.values.toSeq.distinct.size == after.size)
    val mx = if (before.isEmpty) 0 else before.values.max
    (after.keySet -- before.keySet).foreach(nk => assert(after(nk) > mx))
    // idempotence: upserting again changes nothing
    val again = graft.batch.StarModel.upsertDim(
      upserted.toDF("vendor_nk", "vendor_sk"), deduped,
      "vendor_code", "vendor_nk", "vendor_sk")
    assert(again.count() == upserted.count())
  }

  test("resumeDaily skips SUCCEEDED stages and completes the rest") {
    val wh = tmpDir("graft_resume_wh")
    val runner = Runner(spark, wh)
    val (coreRows, factRows) = runner.runDaily(sf(), "run-res-1")

    // full-rerun resume: every stage already SUCCEEDED -> nothing
    // restarts, counts come back from the published tables
    val startedBefore = runner.log.runLog.read
      .filter(col("status") === "STARTED").count()
    val (c2, f2) = runner.resumeDaily(sf(), "run-res-1")
    assert((c2, f2) == ((coreRows, factRows)), "resume reproduces counts")
    assert(runner.log.runLog.read.filter(col("status") === "STARTED").count()
      == startedBefore, "no stage restarted on a fully-complete run")

    // crash-after-stage-1: a new run that only recorded raw_to_stg
    // SUCCEEDED (stg_trip is on disk from the published overwrite)
    runner.log.logRun("run-res-2", "raw_to_stg", "SUCCEEDED")
    val (c3, f3) = runner.resumeDaily(sf(), "run-res-2")
    assert((c3, f3) == ((coreRows, factRows)))
    val r2 = runner.log.runLog.read.filter(col("run_id") === "run-res-2")
    assert(r2.filter(col("stage") === "raw_to_stg" &&
      col("status") === "STARTED").count() == 0,
      "the completed stage never restarts")
    assert(r2.filter(col("stage") === "stg_to_core" &&
      col("status") === "SUCCEEDED").count() == 1 &&
      r2.filter(col("stage") === "core_to_mdl" &&
        col("status") === "SUCCEEDED").count() == 1,
      "the remaining stages ran to completion under the resumed run id")
  }
}
