package graft.lambda

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.batch.StarModel
import graft.functions.TaxiFunctions._
import graft.model.TaxiModel
import graft.ops.SnapshotTable
import graft.stream.HourLoad

/** The lambda architecture's actual promise: BOTH lanes load ONE star.
  *
  * In the reference, the batch daily ELT and the streaming hourly
  * micro-batch write the SAME warehouse tables — batch
  * `sql/batchELT/core/12_trip_clean.dedupe_load.sql` (DELETE WHERE
  * ingest_date = @d, then INSERT) and streaming
  * `sql/streaming/staging/usp_upsert_trip_clean_from_slice_streaming.sql`
  * (MERGE ON trip_id) both hit `core.trip_clean`; batch
  * `sql/batchELT/mdl/load/40_fact_trip.load.sql` and streaming
  * `usp_upsert_fact_trip_streaming.sql` both hit `mdl.fact_trip`. The
  * standalone [[graft.batch.Runner]] / [[graft.stream.HourLoad]] lanes
  * each prove their own pipeline; THIS module is the composition — the
  * unified table schemas and the per-lane commit discipline that let the
  * two coexist in one warehouse:
  *
  *  - '''Key disjointness.''' Batch core rows carry NULL `trip_id`
  *    (ref: `11_trip_clean.slice_ctas.sql:17` — `TRY_CAST(s.trip_id AS
  *    BIGINT)` of a staging feed that has no trip id), so the streaming
  *    MERGE's `ON tgt.trip_id = src.trip_id` can never match a batch row
  *    (NULL equality is not TRUE). In fact, batch keys are SHA-256 hex
  *    (64 chars, ref `40_fact_trip.load.sql:70-79`) while stream keys are
  *    the decimal render of the signed-positive hash64 (≤ 19 digits, ref
  *    `usp_upsert_trips_from_streaming.sql:24` inserted into the CHAR
  *    trip_id of `mdl/fact_trip.table.sql:6`): the two lanes' keyspaces
  *    are disjoint BY FORMAT, so the stream merge upserts only its own
  *    rows — ever.
  *  - '''Slice ownership.''' Batch idempotence is DELETE-WHERE-
  *    ingest_date + INSERT (never a whole-table overwrite — that is the
  *    one semantic the standalone Runner's stage-boundary overwrite could
  *    not carry into a shared warehouse); a batch re-run replaces exactly
  *    the ingest_dates it owns and never reads or rewrites stream rows
  *    (whose wall-clock ingest_dates are disjoint from the historical
  *    batch dates in any live deployment — and whose rows survive even a
  *    colliding date only if the reference's would: the reference DELETE
  *    takes the whole date slice, and so does this one).
  *  - '''Shared dims.''' One SK space (reference IDENTITY columns):
  *    batch seeds the five dims, the stream lane anti-join-appends novel
  *    vendor/payment NKs (`usp_upsert_dims_from_slice_streaming.sql`);
  *    SKs never move once assigned, so fact rows from either lane stay
  *    valid forever.
  *
  * Scale shape: both shared tables are hive-partitioned by
  * `pickup_month` (yyyymm INT — functionally determined by each lane's
  * merge/ownership key, so replays land in their original partition).
  * The stream merge is partition-scoped O(months touched by the hour) ≈
  * 1-2; the batch replace rewrites only months holding its slice's rows
  * (a daily slice at 100 TB touches the current month plus the bounded
  * late-arrival tail, and locating owned rows is a predicate scan that
  * parquet ingest_date min/max stats prune to those same months). All
  * commits are single atomic manifest publishes ([[SnapshotTable]]), so
  * a BI reader never sees a torn cross-lane state.
  */
object Lambda {

  /** Unified `core.trip_clean` (ref `11_trip_clean.slice_ctas.sql:14-55`
    * column set + the streaming lineage trio of
    * `usp_upsert_trip_clean_from_slice_streaming.sql:45-49`, plus the
    * batch lane's pass-through attribute columns the star build consumes
    * — NULL on stream rows, exactly as the reference's streaming fact
    * proc resolves their SKs to -1 without them). */
  val coreSchema: StructType = StructType.fromDDL(
    "trip_id BIGINT, vendor_code STRING, pickup_ts_utc TIMESTAMP_NTZ, " +
      "dropoff_ts_utc TIMESTAMP_NTZ, trip_distance_km DOUBLE, " +
      "fare_amount DOUBLE, payment_type STRING, is_night_ride INT, " +
      "tip_amount DOUBLE, tolls_amount DOUBLE, total_amount DOUBLE, " +
      "rate_code INT, flag_raw STRING, pu_location_id INT, " +
      "do_location_id INT, ingest_date DATE, source_file_name STRING, " +
      "loaded_at TIMESTAMP_NTZ, _runId STRING, _blobPath STRING, " +
      "_ingestedAt TIMESTAMP_NTZ, pickup_month INT")

  /** Unified `mdl.fact_trip` (ref `mdl/fact_trip.table.sql:3-31`: CHAR
    * trip_id + 8 SK columns + additive measures + lineage), with `_runId`
    * carried per the streaming proc's optional lineage column. */
  val factSchema: StructType = StructType.fromDDL(
    "trip_id STRING, pickup_date_key INT, pickup_time_key INT, " +
      "vendor_sk INT, payment_sk INT, rate_sk INT, flag_sk INT, " +
      "pu_location_sk INT, do_location_sk INT, trip_distance_km DOUBLE, " +
      "fare_amount DOUBLE, tip_amount DOUBLE, tolls_amount DOUBLE, " +
      "total_amount DOUBLE, ingest_date DATE, source_file_name STRING, " +
      "loaded_at TIMESTAMP_NTZ, _runId STRING, pickup_month INT")

  private def dimSchema(nk: String, nkType: String, sk: String): StructType =
    StructType.fromDDL(s"$nk $nkType, $sk INT")

  /** One shared warehouse, both lanes. The stream lane's stg + slice
    * scratch tables keep their lane-local names/schemas (they never
    * collide with batch tables); `core_trip_clean` and `fact_trip` are
    * the shared star. */
  final case class SharedWarehouse(spark: SparkSession, dir: String) {
    val core: SnapshotTable =
      SnapshotTable(spark, s"$dir/core_trip_clean", coreSchema, Seq("pickup_month"))
    val fact: SnapshotTable =
      SnapshotTable(spark, s"$dir/fact_trip", factSchema, Seq("pickup_month"))
    val dimVendor: SnapshotTable =
      SnapshotTable(spark, s"$dir/dim_vendor", dimSchema("vendor_nk", "STRING", "vendor_sk"))
    val dimPayment: SnapshotTable =
      SnapshotTable(spark, s"$dir/dim_payment", dimSchema("payment_nk", "STRING", "payment_sk"))
    val dimRate: SnapshotTable =
      SnapshotTable(spark, s"$dir/dim_rate", dimSchema("rate_nk", "INT", "rate_sk"))
    val dimFlag: SnapshotTable =
      SnapshotTable(spark, s"$dir/dim_flag", dimSchema("flag_nk", "STRING", "flag_sk"))
    val dimLocation: SnapshotTable =
      SnapshotTable(spark, s"$dir/dim_location", dimSchema("loc_nk", "INT", "loc_sk"))
    val stg: SnapshotTable = SnapshotTable(spark, s"$dir/stg_trips_streaming",
      HourLoad.stgSchema, Seq("p_date", "p_hour"))
    val slice: SnapshotTable =
      SnapshotTable(spark, s"$dir/core_trip_clean_slice", HourLoad.coreSchema)
    val audit: SnapshotTable =
      SnapshotTable(spark, s"$dir/ingest_audit", HourLoad.auditSchema)
    val fileAudit: SnapshotTable =
      SnapshotTable(spark, s"$dir/ingest_file_audit", HourLoad.fileAuditSchema)
  }

  /** Cross-lane WRITER serialization — the transaction-boundary analog of
    * the reference warehouse's locks. The snapshot layer gives READERS
    * atomic versions, but two writers read-merge-overwriting the same
    * `pickup_month` partition would race, and the lanes legitimately
    * collide: a daily batch backfill touches the month the hourly stream
    * is loading. One coarse per-warehouse [[LaneLock]] around each lane's
    * read-merge-commit section makes the composition serializable, as
    * the reference's MERGE/DELETE are under its engine's locking.
    *
    * The lock is FENCED (nonce identity, heartbeat renewal, publish-chain
    * takeover — see [[LaneLock]]): the body receives the handle and the
    * lane calls `assertHeld()` immediately before every publish, so a
    * usurped slow holder aborts with [[LockLostException]] instead of
    * last-writer-winning. Beneath it, every merge commit goes through
    * [[SnapshotTable.overwritePartitionsCas]], which detects a
    * same-partition race at the manifest tip — so even a LOST fencing
    * race cannot erase the other lane's commit; the lock is throughput
    * hygiene, the tip CAS is the correctness floor. Corollary: a
    * [[LockLostException]] escaping the body is RETRYABLE — the usurped
    * holder's already-committed publishes are durable CAS commits and
    * both lanes' merges are idempotent re-derivations, so the caller
    * re-runs the whole locked section (the reference analog: a victim of
    * the warehouse's lock timeout re-submits the batch). Audit APPENDS run
    * inside the locked section too (they are cheap CAS-merge commits) and
    * are IDEMPOTENT under that retry — a keyed (run_id, p_date, p_hour)
    * existence check guards each append, so a section usurped between its
    * audit row and its file-audit rows re-runs without double-logging;
    * they remain at-most-once relative to the data commit on a crash
    * between the two — the same two-statement exposure the reference
    * procs have outside an explicit transaction. */
  private[graft] val DefaultTtlMs: Long = 15 * 60 * 1000L

  private[graft] def withLaneLock[T](wh: SharedWarehouse,
                                     ttlMs: Long = DefaultTtlMs,
                                     renew: Boolean = true)
                                    (body: LaneLock => T): T = {
    val lock = LaneLock.acquire(wh.spark, wh.dir, ttlMs, renew)
    try body(lock)
    finally lock.release()
  }

  /** Bounded self-retry of a usurped locked section (VERDICT r16 #7) —
    * the recovery the soak lanes proved at 200 cycles, hoisted into the
    * production entry points. [[LockLostException]] is retryable BY
    * CONSTRUCTION here: every publish beneath the lock is tip-CAS-
    * validated (a usurped holder's completed commits are durable, its
    * aborted one never landed) and both lanes' merges are idempotent
    * re-derivations, so re-running the whole locked section converges —
    * the reference analog is a victim of the warehouse's lock timeout
    * re-submitting the batch. Bounded: persistent usurpation (a mis-
    * configured TTL shorter than the section) must surface, not spin. */
  private[graft] def retryUsurped[T](maxAttempts: Int = 5,
                                     backoffMs: Long = 200L,
                                     onRetry: (LockLostException, Int) => Unit =
                                       (_, _) => ())(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: LockLostException =>
          if (attempt >= maxAttempts) throw e
          onRetry(e, attempt)
          attempt += 1
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The production sections' retry hook: each usurpation re-run leaves a
    * durable `usurped_retry` telemetry row next to the victim's
    * `fenced_abort` and the usurper's `takeover` ([[LaneLock.events]]) —
    * retry counts live in the warehouse, not a JVM. */
  private def logRetry(wh: SharedWarehouse,
                       section: String): (LockLostException, Int) => Unit =
    (_, attempt) => LaneLock.logWarehouseEvent(wh.spark, wh.dir,
      "usurped_retry", nonce = section, detail = s"attempt=$attempt")

  private def pickupMonth(ts: Column): Column =
    (year(ts) * 100 + month(ts)).cast("int")

  /** Slice-idempotent replace — the reference's `DELETE FROM t WHERE
    * <owns>; INSERT <fresh>` pair as ONE atomic dynamic partition
    * overwrite: rewrite exactly the `pickup_month` partitions that either
    * receive fresh rows or still hold rows this lane owns, carrying every
    * non-owned row in them forward untouched. Months left EMPTY by the
    * replace (a shrinking re-run — rare) ride the SAME commit as manifest
    * drops (`overwritePartitionsCas(dropWhere)`), CAS-validated like the
    * rewritten months: the whole DELETE+INSERT is one atomic publish — no
    * reader ever sees a half-replaced state, and a concurrent commit into
    * a month this replace would empty fails the CAS and forces a
    * re-derive instead of being erased by a follow-up drop. */
  private[graft] def sliceReplace(table: SnapshotTable, fresh: DataFrame,
                                  owns: Column,
                                  fence: () => Unit = () => ()): Unit = {
    val freshMonths = fresh.select(col("pickup_month").cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    var committed = false
    while (!committed) {
      // optimistic read-merge-write: pin the base version the merge is
      // derived from; the commit below CAS-validates every touched month
      // against it, so a concurrent writer to the same month makes THIS
      // replace re-derive instead of silently erasing either side
      val base = table.latestVersion
      // months still holding owned rows: predicate scan, pruned by parquet
      // ingest_date stats (date-clustered data → only candidate months read)
      val ownedMonths = table.readAt(base).filter(owns)
        .select(col("pickup_month").cast("string"))
        .distinct().collect().map(_.getString(0)).toSet
      val touched = freshMonths ++ ownedMonths
      if (touched.isEmpty) return
      val survivors = table.readPartitionsByFirstValueAt(base, {
        case Some(v) => touched.contains(v)
        case None    => false // pickup_month is never null (domain-filtered)
      }).filter(not(coalesce(owns, lit(false))))
      // Months this replace empties: owned at base, no fresh rows, no
      // surviving non-owned rows. Only ownedMonths \ freshMonths can
      // qualify (the steady-state re-run has none — this costs nothing);
      // the emptiness proof is pinned at `base`, which is exactly the
      // snapshot the commit validates those months against.
      val maybeEmptied = ownedMonths -- freshMonths
      val emptied =
        if (maybeEmptied.isEmpty) Set.empty[String]
        else maybeEmptied -- survivors
          .filter(col("pickup_month").cast("string").isin(maybeEmptied.toSeq: _*))
          .select(col("pickup_month").cast("string"))
          .distinct().collect().map(_.getString(0)).toSet
      fence() // abort-before-publish if this lane's lock was usurped
      // allowMissingColumns: either side may be narrower under additive
      // drift — survivors read the evolved width while an unchanged
      // producer's fresh rows don't carry the new columns (NULL-pad), or
      // a drift-aware producer is first to carry a column the table
      // hasn't seen (survivors pad; the commit evolves the table)
      committed = table.overwritePartitionsCas(
        survivors.unionByName(fresh, allowMissingColumns = true),
        base, dropWhere = v => v.exists(emptied.contains)).isDefined
    }
  }

  /** Upsert all five dims from a cleaned-shape frame (batch seeds every
    * dim; the stream lane's frame simply contributes NULL-free NKs only
    * where it has them — vendor/payment — matching
    * `usp_upsert_dims_from_slice_streaming.sql`'s vendor/payment/location
    * scope). SKs continue after max and never move (IDENTITY analog). */
  /** One dim's read-upsert-replace as an optimistic CAS loop: derive from
    * the tip, commit only while the tip is unmoved ([[SnapshotTable
    * .overwriteCas]]), re-derive on a lost race — so even two UNLOCKED
    * dim upserters serialize (append-only NKs make every interleaving
    * converge) and the lane lock stays throughput hygiene for dims too,
    * exactly as the tip CAS makes it for the fact/core merges. */
  private[graft] def upsertDimCas(table: SnapshotTable, src: DataFrame,
                                  srcCol: String, nk: String, sk: String,
                                  fence: () => Unit = () => ()): Unit = {
    var committed = false
    while (!committed) {
      val base = table.latestVersion
      val upserted = StarModel.upsertDim(table.readAt(base), src, srcCol, nk, sk)
      fence()
      committed = table.overwriteCas(upserted, base).isDefined
    }
  }

  /** SCD1 attribute refresh on a shared dim (VERDICT r17 #8): overwrite
    * changed ATTRIBUTE values in place while the SK space — every
    * (nk, sk) pair — stays immovable, so fact rows from either lane keep
    * resolving forever. The reference analog: an UPDATE on a dim's
    * display columns under the warehouse's locking, the one dim write
    * its insert-missing-NK upsert (`10_dim_vendor.upsert.sql`) cannot
    * express.
    *
    * `updates` carries the natural key plus any attribute columns; rows
    * are matched by NK (updates for unknown NKs are ignored — inserts go
    * through the upsert path), matched attributes overwrite, unmatched
    * members keep their values. An attribute column the dim has never
    * seen ADDS via the snapshot layer's additive evolution (members not
    * in `updates` read NULL until a refresh names them). Concurrency is
    * the dim upsert's own discipline: a whole-table CAS loop
    * ([[SnapshotTable.overwriteCas]]) — a lane appending a novel NK
    * mid-refresh costs this refresh a re-derive, never an erased member
    * (the FK-integrity property the spec races). Duplicate update NKs
    * refuse loudly: they would fan out the dim and corrupt every fact
    * join.
    *
    * NULL update values KEEP the current attribute (ADVICE r18 — this is
    * a contract, not an accident): merge is `coalesce(update, current)`
    * per attribute, so a sparse updates frame — say, a feed that only
    * knows `zone_name` for some members — never erases the attributes it
    * doesn't carry. The corollary: this refresh cannot SET an attribute
    * to NULL. To blank an attribute, write an explicit sentinel ('' /
    * 'UNKNOWN', the reference's own convention for retired zone names)
    * or rebuild the dim through [[SnapshotTable.overwriteCas]] directly. */
  def refreshDimScd1(table: SnapshotTable, updates: DataFrame,
                     nk: String): Long =
    refreshDimScd1Hook(table, updates, nk, () => ())

  private[graft] def refreshDimScd1Hook(table: SnapshotTable,
      updates: DataFrame, nk: String, beforeCommit: () => Unit): Long = {
    val attrs = updates.columns.filterNot(_ == nk).toSeq
    require(attrs.nonEmpty, s"dim refresh needs at least one attribute column besides $nk")
    val u = updates.persist()
    try {
      val (total, distinct) = {
        val r = u.agg(count(lit(1)), countDistinct(col(nk))).first()
        (r.getLong(0), r.getLong(1))
      }
      require(total == distinct,
        s"dim refresh refused: duplicate $nk values in updates ($total rows, " +
          s"$distinct distinct) would fan out the dim and corrupt fact joins")
      var committed = Option.empty[Long]
      while (committed.isEmpty) {
        val base = table.latestVersion
        val cur = table.readAt(base)
        val curAttrs = cur.columns.filterNot(_ == nk).toSeq
        val refreshed = cur.as("c")
          .join(broadcast(u.as("u")), col(s"c.$nk") === col(s"u.$nk"), "left")
          .select(col(s"c.$nk").as(nk) +:
            (curAttrs.map { c =>
              if (attrs.contains(c)) coalesce(col(s"u.$c"), col(s"c.$c")).as(c)
              else col(s"c.$c").as(c)
            } ++ attrs.filterNot(curAttrs.contains).map(c => col(s"u.$c").as(c))): _*)
        beforeCommit()
        committed = table.overwriteCas(refreshed, base)
      }
      committed.get
    } finally { u.unpersist(): Unit }
  }

  private def upsertDims(wh: SharedWarehouse, cleaned: DataFrame,
                         fence: () => Unit): Unit = {
    upsertDimCas(wh.dimVendor, cleaned, "vendor_code", "vendor_nk", "vendor_sk", fence)
    upsertDimCas(wh.dimPayment, cleaned, "payment_type", "payment_nk", "payment_sk", fence)
    upsertDimCas(wh.dimRate, cleaned, "rate_code", "rate_nk", "rate_sk", fence)
    upsertDimCas(wh.dimFlag, cleaned, "flag_raw", "flag_nk", "flag_sk", fence)
    val locs = cleaned.select(col("pu_location_id").as("loc_nk"))
      .unionByName(cleaned.select(col("do_location_id").as("loc_nk")))
    upsertDimCas(wh.dimLocation, locs, "loc_nk", "loc_nk", "loc_sk", fence)
  }

  /** The batch daily load into the SHARED star: fixtures → cleaned →
    * deduped (the Runner's exact transforms), dims upserted (not
    * rebuilt — the shared SK space), then slice-idempotent replace of
    * the run's ingest_dates in `core_trip_clean` and `fact_trip`
    * (ref `12_trip_clean.dedupe_load.sql:6` + `40_fact_trip.load.sql:4`:
    * `DELETE ... WHERE ingest_date = @d` then INSERT). Returns (core
    * rows, fact rows) loaded. Re-runs are byte-level no-ops on the other
    * lane's rows: the replace never touches a row it does not own. */
  def runDaily(wh: SharedWarehouse, sfDir: String, runId: String,
               ttlMs: Long = DefaultTtlMs): (Long, Long) = {
    val spark = wh.spark
    val deduped = TaxiModel.deduped(TaxiModel.cleaned(
      TaxiModel.tripsWithDups(spark, sfDir), TaxiModel.paymentTypeMap(spark)))
      .persist() // read by 5 dim upserts + core projection + fact build
    try {
      // materialize the expensive transform chain BEFORE taking the lane
      // lock — the locked section then pays only projections + writes;
      // the count doubles as this run's core load size
      val coreLoaded = deduped.count()

      // Literal reference ownership: the batch DELETE takes the WHOLE
      // ingest_date slice (12_trip_clean.dedupe_load.sql:6 has no lane
      // qualifier). The lanes coexist because their ingest_dates are
      // operationally disjoint — batch loads historical daily files,
      // stream rows stamp wall-clock ingestion dates (LambdaSpec asserts
      // the invariant and the coexistence it buys).
      val ownedDates = deduped.select(col("ingest_date")).distinct()
        .collect().map(_.getDate(0)).toSeq
      val owns = col("ingest_date").isin(ownedDates: _*)
      // the locked section = everything whose read-merge-write could race
      // the stream lane: dim upserts (read-modify-overwrite) + both
      // shared-table slice replaces. The handle fences every publish —
      // a usurped holder aborts (LockLostException) before it can
      // last-writer-win over the usurper's commit — and the bounded
      // retryUsurped re-runs the section (idempotent: the replace is
      // keyed on the run's ingest_dates, the dim upserts on NKs).
      retryUsurped(onRetry = logRetry(wh, "runDaily")) {
        withLaneLock(wh, ttlMs) { lock =>
        upsertDims(wh, deduped, () => lock.assertHeld())

        // core rows: batch trip_id is NULL (ref
        // 11_trip_clean.slice_ctas.sql:17 — the staging feed carries no
        // reliable trip id), stream lineage NULL
        val coreRows = deduped.select(
        lit(null).cast("bigint").as("trip_id"),
        col("vendor_code"), col("pickup_ts_utc"), col("dropoff_ts_utc"),
        col("trip_distance_km"), col("fare_amount"), col("payment_type"),
        col("is_night_ride").cast("int").as("is_night_ride"),
        col("tip_amount"), col("tolls_amount"), col("total_amount"),
        col("rate_code").cast("int").as("rate_code"), col("flag_raw"),
        col("pu_location_id"), col("do_location_id"),
        col("ingest_date"), col("source_file_name"), col("loaded_at"),
        lit(null).cast("string").as("_runId"),
        lit(null).cast("string").as("_blobPath"),
        lit(null).cast("timestamp_ntz").as("_ingestedAt"),
        pickupMonth(col("pickup_ts_utc")).as("pickup_month"))
        sliceReplace(wh.core, coreRows, owns, () => lock.assertHeld())

        // fact rows: the Runner's star build, resolved against the SHARED
        // dims (broadcast LocalRelations after the bounded dim reads)
        val factAll = StarModel.fact(deduped,
          wh.dimVendor.read, wh.dimPayment.read, wh.dimRate.read,
          wh.dimFlag.read, wh.dimLocation.read)
        val factRows = factAll.select(
          col("trip_id"), col("pickup_date_key"), col("pickup_time_key"),
          col("vendor_sk"), col("payment_sk"), col("rate_sk"), col("flag_sk"),
          col("pu_location_sk"), col("do_location_sk"),
          col("trip_distance_km"), col("fare_amount"), col("tip_amount"),
          col("tolls_amount"), col("total_amount"),
          col("ingest_date"), col("source_file_name"), col("loaded_at"),
          lit(runId).as("_runId"),
          (col("pickup_date_key") / 100).cast("int").as("pickup_month"))
        // fact ownership is the same literal date slice
        // (40_fact_trip.load.sql:4); the count is THIS run's fact load
        // (the dims it resolved against are pinned under the lock)
        val factLoaded = factRows.count()
        sliceReplace(wh.fact, factRows, owns, () => lock.assertHeld())
        (coreLoaded, factLoaded)
      } }
    } finally deduped.unpersist(): Unit
  }

  /** One streaming hour into the SHARED star: the stream lane's own
    * staging + slice build ([[HourLoad.stageHourAndSlice]], unchanged
    * semantics), then the slice projected to the unified cleaned shape
    * (ref `usp_upsert_trips_from_streaming.sql:20-47`) and MERGEd on
    * `trip_id` into the shared core and fact — partition-scoped
    * update-then-insert, never matching a batch row. */
  def runHour(wh: SharedWarehouse, curatedDir: String, date: String,
              hour: String, runId: String, ttlMs: Long = DefaultTtlMs,
              midHook: () => Unit = () => ()): HourLoad.HourResult = {
    val spark = wh.spark
    val stagedHour = HourLoad.stageHourAndSlice(spark, wh.stg, wh.slice,
      curatedDir, date, hour, runId)
      .getOrElse(return HourLoad.HourResult(0, 0, 0, 0, 0))

    // unified cleaned shape (usp_upsert_trips_from_streaming.sql:20-47):
    // vendor as-is, miles→km, payment truncated to the core column's 16
    // (LEFT(payment_type,16) in the core MERGE), night flag per SURVEY
    // §7.4 decision 6 ([22,5] — the pinned normalization of the
    // reference's two variants), ingest_date from the ingestion stamp,
    // source_file_name = blob basename with the 'streaming' fallback.
    // Two pinned deviations from the proc, both documented: fare_amount
    // is the stream's fare (the proc's `CAST(b.totalAmount) AS
    // fare_amount` template slip would double-book totals as fares), and
    // loaded_at = _ingestedAt (SYSUTCDATETIME() at slice build would make
    // every re-run a spurious column change).
    val slice = wh.slice.read.filter(col("_runId") === runId)
    // wire-drift passthrough (VERDICT r18 #4): x_<key> columns the
    // staging expansion surfaced ride the fixed cleaned projection into
    // the shared core, which evolves additively in the merge commit —
    // the fact's declared measures stay fixed (drift is lineage, not a
    // measure)
    val driftCols = slice.columns.filter(_.startsWith("x_")).sorted
      .map(col).toSeq
    val cleanedSlice = slice.select(Seq(
      col("trip_id"),
      col("vendor_id").as("vendor_code"),
      col("pickup_ts").as("pickup_ts_utc"),
      col("dropoff_ts").as("dropoff_ts_utc"),
      milesToKm(col("trip_distance")).as("trip_distance_km"),
      col("fare_amount"),
      truncateTo(col("payment_type"), 16).as("payment_type"),
      nightFlag(col("pickup_ts")).cast("int").as("is_night_ride"),
      col("tip_amount"),
      lit(null).cast("double").as("tolls_amount"),
      col("total_amount"),
      lit(null).cast("int").as("rate_code"),
      lit(null).cast("string").as("flag_raw"),
      lit(null).cast("int").as("pu_location_id"),
      lit(null).cast("int").as("do_location_id"),
      col("ingest_date"),
      coalesce(basename(col("_blobPath")), lit("streaming")).as("source_file_name"),
      col("_ingestedAt").as("loaded_at"),
      col("_runId"), col("_blobPath"), col("_ingestedAt"),
      pickupMonth(col("pickup_ts")).as("pickup_month")) ++ driftCols: _*)

    // usp_upsert_trip_clean_from_slice_streaming: MERGE ON trip_id —
    // batch rows (NULL trip_id) never match, so they are carried forward
    // untouched by the partition-scoped update-then-insert. The whole
    // merge+dims+fact+audit section holds the lane lock (the reference
    // proc logs within the same procedure — audit appends are cheap CAS
    // commits, and keeping them inside the writer turn means the audit
    // order matches the serialization order; on a crash between the data
    // commit and its audit row the row is simply missing — at-most-once,
    // the same exposure the reference's two statements have outside an
    // explicit transaction). Every publish is fenced via assertHeld.
    // retryUsurped: a mid-section usurpation re-runs the WHOLE section —
    // safe because the core/fact merges are idempotent on trip_id, the
    // dim upserts on NK, and the audit appends are keyed on
    // (run_id, p_date, p_hour)
    val res = retryUsurped(onRetry = logRetry(wh, "runHour")) {
      withLaneLock(wh, ttlMs) { lock =>
      val fence = () => lock.assertHeld()
      val (inserted, updated) =
        HourLoad.scopedMerge(wh.core, cleanedSlice, "pickup_month", fence)
      midHook() // test seam: LambdaSpec usurps HERE, mid-section

      // usp_upsert_dims_from_slice_streaming: novel vendor/payment NKs
      // (rate/flag/location frames are all-NULL here → anti-join appends
      // nothing, the proc's "if present" scope)
      upsertDims(wh, cleanedSlice, fence)

      // usp_upsert_fact_trip_streaming: resolve SKs against the SHARED
      // dims (COALESCE -1 unknown; pu/do forced -1 per the proc), stream
      // key rendered into the string trip_id column — format-disjoint
      // from the batch lane's SHA-256 hex
      val factStaged = cleanedSlice
      .join(broadcast(wh.dimVendor.read),
        cleanedSlice("vendor_code") === col("vendor_nk"), "left")
      .join(broadcast(wh.dimPayment.read),
        cleanedSlice("payment_type") === col("payment_nk"), "left")
      .select(
        col("trip_id").cast("string").as("trip_id"),
        dateKey(col("pickup_ts_utc")).as("pickup_date_key"),
        timeKey(col("pickup_ts_utc")).as("pickup_time_key"),
        coalesce(col("vendor_sk"), lit(-1)).as("vendor_sk"),
        coalesce(col("payment_sk"), lit(-1)).as("payment_sk"),
        lit(-1).as("rate_sk"), lit(-1).as("flag_sk"),
        lit(-1).as("pu_location_sk"), lit(-1).as("do_location_sk"),
        col("trip_distance_km"), col("fare_amount"), col("tip_amount"),
        col("tolls_amount"), col("total_amount"),
        col("ingest_date"), col("source_file_name"), col("loaded_at"),
        col("_runId"), col("pickup_month"))
      HourLoad.scopedMerge(wh.fact, factStaged, "pickup_month", fence): Unit

      val r = HourLoad.HourResult(stagedHour.files, stagedHour.rowsCopied,
        inserted, updated, inserted + updated)
      import spark.implicits._
      // audit idempotence under the documented LockLostException retry:
      // a re-run of the locked section must not double-log the hour. The
      // row is keyed (run_id, p_date, p_hour) and only THIS caller ever
      // writes its runId, so the check-then-append races nobody. The
      // read plans one relation per live audit commit dir — bounded by
      // the post-success compaction below, so the check stays O(1)
      // across years of hourly appends
      val hourKey = col("run_id") === runId &&
        col("p_date") === date && col("p_hour") === hour
      fence()
      if (wh.audit.read.filter(hourKey).isEmpty)
        wh.audit.append(Seq((runId, date, hour, r.files, r.rowsCopied,
          r.inserted, r.updated, r.total))
          .toDF(HourLoad.auditSchema.fieldNames.toSeq: _*))
      // per-blob audit rows (stg.usp_log_ingest: one 'Succeeded' row per
      // file) — file-level forensics in the shared warehouse, same as the
      // standalone lane
      fence()
      if (wh.fileAudit.read.filter(hourKey).isEmpty)
        wh.fileAudit.append(stagedHour.perBlob
          .map { case (blob, rows) => (runId, date, hour, blob, rows, "Succeeded") }
          .toDF(HourLoad.fileAuditSchema.fieldNames.toSeq: _*))
      r
    } }

    // usp_purge_trip_clean_slice_streaming: post-success purge of the
    // lane-LOCAL slice scratch (no cross-lane state — outside the lock)
    wh.slice.deleteWhere(col("_runId") === runId)
    // keep the audit tables' live-dir count bounded: every hour appends
    // one commit dir and the locked-section idempotence check plans one
    // relation per live dir — fold them back periodically (compact is
    // CAS-safe standalone, no lock needed) so that check never grows
    // with table history
    if (wh.audit.liveCommitDirs > 32) wh.audit.compact(): Unit
    if (wh.fileAudit.liveCommitDirs > 32) wh.fileAudit.compact(): Unit
    res
  }

  /** `vw_fact_trip_bi` analog over the MERGED star
    * (ref `mdl/views/vw_fact_trip_bi.view.sql`): fact ⋈ broadcast dims
    * (LEFT — the -1 unknown members resolve to NULL attributes, as the
    * reference view's LEFT JOINs do), calendar/time attributes derived
    * from the smart keys (the dim_date/dim_time rows are pure functions
    * of the key — deriving them inline keeps the view total over BOTH
    * lanes' disjoint date ranges), plus the view's tip_pct / fare_per_km
    * QA measures. */
  /** Pure-SQL surface over the SHARED star (the [[graft.Catalog]]
    * pattern applied to a live dual-lane warehouse): every shared table
    * plus the BI view as temp views, so a user of the reference's
    * warehouse can point `spark.sql` at the merged star — the switch
    * story end-to-end. View names mirror the reference's object names
    * (mdl/core schema prefixes collapse into the name as elsewhere).
    *
    * The views are LIVE, not pinned (VERDICT r16 #4): each is SQL text
    * over the `snapshot_at` table function, and Spark re-analyzes a
    * SQL-text temp view per referencing query (the default
    * `storeAnalyzedPlanForView=false` behavior), so every query
    * re-resolves the table's CURRENT manifest tip — an hour loaded after
    * registration is visible through `lambda_vw_fact_trip_bi` without
    * re-registering, exactly as the reference's warehouse views track
    * their tables. (A DataFrame-created temp view would pin the snapshot
    * observed at registration — the r16 gap.) Each query still reads ONE
    * atomic version per table: within a query the tip is resolved once.
    *
    * Requires every shared table to have ≥1 commit (snapshot_at refuses
    * a manifest-less dir rather than masking a typo'd path) — register
    * after the first load, which is also when views become useful. */
  def registerViews(wh: SharedWarehouse): Unit = {
    val s = wh.spark
    def reg(name: String, t: SnapshotTable): Unit = {
      // SQL-escape the warehouse path (it lands inside a single-quoted
      // literal): a quote in the dir must not break — or inject into —
      // the view text
      val dir = t.dir.replace("'", "''")
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS " +
        s"SELECT * FROM ${graft.sql.SnapshotTableFunction.name}('$dir')"): Unit
    }
    reg("lambda_core_trip_clean", wh.core)
    reg("lambda_fact_trip", wh.fact)
    reg("lambda_dim_vendor", wh.dimVendor)
    reg("lambda_dim_payment", wh.dimPayment)
    reg("lambda_dim_rate", wh.dimRate)
    reg("lambda_dim_flag", wh.dimFlag)
    reg("lambda_dim_location", wh.dimLocation)
    // the BI view as SQL text over the live views (broadcast hints keep
    // the physical shape of [[biView]]); LambdaSpec pins SQL == API
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW lambda_vw_fact_trip_bi AS
        |SELECT /*+ BROADCAST(dv, dp, dr, dfl, pu, dol) */
        |  f.trip_id,
        |  f.pickup_date_key,
        |  to_date(cast(f.pickup_date_key AS STRING), 'yyyyMMdd') AS pickup_date,
        |  f.pickup_time_key,
        |  cast(f.pickup_time_key / 3600 AS INT) AS pickup_hour,
        |  (cast(f.pickup_time_key / 3600 AS INT) >= 22
        |    OR cast(f.pickup_time_key / 3600 AS INT) <= 5) AS is_night_ride,
        |  dv.vendor_nk AS vendor_code,
        |  dp.payment_nk AS payment_type,
        |  dr.rate_nk AS rate_code,
        |  dfl.flag_nk AS store_and_fwd_flag,
        |  pu.loc_nk AS pu_location_id,
        |  dol.loc_nk AS do_location_id,
        |  f.trip_distance_km, f.fare_amount, f.tip_amount,
        |  f.tolls_amount, f.total_amount,
        |  CASE WHEN f.fare_amount > 0
        |    THEN f.tip_amount / f.fare_amount END AS tip_pct,
        |  CASE WHEN f.trip_distance_km > 0
        |    THEN f.fare_amount / f.trip_distance_km END AS fare_per_km,
        |  f.ingest_date, f.source_file_name
        |FROM lambda_fact_trip f
        |LEFT JOIN lambda_dim_vendor dv ON f.vendor_sk = dv.vendor_sk
        |LEFT JOIN lambda_dim_payment dp ON f.payment_sk = dp.payment_sk
        |LEFT JOIN lambda_dim_rate dr ON f.rate_sk = dr.rate_sk
        |LEFT JOIN lambda_dim_flag dfl ON f.flag_sk = dfl.flag_sk
        |LEFT JOIN lambda_dim_location pu ON f.pu_location_sk = pu.loc_sk
        |LEFT JOIN lambda_dim_location dol ON f.do_location_sk = dol.loc_sk
        |""".stripMargin): Unit
  }

  def biView(wh: SharedWarehouse): DataFrame = {
    val f = wh.fact.read
    val dv = wh.dimVendor.read.withColumnRenamed("vendor_sk", "_dv_sk")
    val dp = wh.dimPayment.read.withColumnRenamed("payment_sk", "_dp_sk")
    val dr = wh.dimRate.read.withColumnRenamed("rate_sk", "_dr_sk")
    val dfl = wh.dimFlag.read.withColumnRenamed("flag_sk", "_df_sk")
    val pu = wh.dimLocation.read
      .select(col("loc_nk").as("_pu_nk"), col("loc_sk").as("_pu_sk"))
    val dol = wh.dimLocation.read
      .select(col("loc_nk").as("_do_nk"), col("loc_sk").as("_do_sk"))
    val hh = (col("pickup_time_key") / 3600).cast("int")
    f.join(broadcast(dv), f("vendor_sk") === col("_dv_sk"), "left")
      .join(broadcast(dp), f("payment_sk") === col("_dp_sk"), "left")
      .join(broadcast(dr), f("rate_sk") === col("_dr_sk"), "left")
      .join(broadcast(dfl), f("flag_sk") === col("_df_sk"), "left")
      .join(broadcast(pu), f("pu_location_sk") === col("_pu_sk"), "left")
      .join(broadcast(dol), f("do_location_sk") === col("_do_sk"), "left")
      .select(
        col("trip_id"),
        col("pickup_date_key"),
        to_date(col("pickup_date_key").cast("string"), "yyyyMMdd").as("pickup_date"),
        col("pickup_time_key"),
        hh.as("pickup_hour"),
        (hh >= 22 || hh <= 5).as("is_night_ride"),
        col("vendor_nk").as("vendor_code"),
        col("payment_nk").as("payment_type"),
        col("rate_nk").as("rate_code"),
        col("flag_nk").as("store_and_fwd_flag"),
        col("_pu_nk").as("pu_location_id"),
        col("_do_nk").as("do_location_id"),
        col("trip_distance_km"), col("fare_amount"), col("tip_amount"),
        col("tolls_amount"), col("total_amount"),
        when(col("fare_amount") > 0, col("tip_amount") / col("fare_amount"))
          .as("tip_pct"),
        when(col("trip_distance_km") > 0,
          col("fare_amount") / col("trip_distance_km")).as("fare_per_km"),
        col("ingest_date"), col("source_file_name"))
  }
}
