package graft.lambda

import java.util.UUID
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.ops.AtomicPublish

/** Thrown by [[LaneLock.assertHeld]] when the holder has been usurped (a
  * taker judged it crashed past the TTL and took over). The holder must
  * abort its remaining publishes — the usurper now owns the warehouse's
  * write turn, and a late last-writer-wins partition overwrite from the
  * old holder would silently erase the usurper's commit. */
final class LockLostException(msg: String) extends RuntimeException(msg)

/** Fenced cross-lane writer mutex (VERDICT r15 #1) — the reference
  * warehouse's lock manager re-expressed on a filesystem, with the
  * failure modes of the round-15 delete-based marker closed:
  *
  *  - '''No blind delete, no TOCTOU.''' Lock state is an append-only
  *    version chain (`_lane_lock.d/v%08d`, same [[AtomicPublish]]
  *    publish-no-overwrite CAS as snapshot manifests). ACQUIRE, TAKEOVER
  *    and RELEASE are all "publish the next version" — a stale takeover
  *    never deletes the observed lock file, it publishes `held` over it;
  *    two takers racing the same stale tip race the same version slot
  *    and the kernel/namenode picks exactly one winner. A third party
  *    can never slip in on a destroyed live lock because no LIVE state
  *    is ever destroyed — the chain reap only touches slots ≥8 below the
  *    tip, and every acquisition win is re-validated against the re-read
  *    tip ([[tryAcquireFrom]]), so a stalled taker that wins a reaped
  *    below-tip slot learns the win is meaningless instead of believing
  *    it holds a lock another process owns.
  *  - '''Owner identity.''' Every state carries the holder's UUID nonce.
  *    [[release]] publishes `released` only while the tip is still its
  *    own nonce — a usurped holder's release is a no-op on the usurper's
  *    lock (the round-15 marker's unconditional `finally delete` handed
  *    the usurper's lock to a third writer).
  *  - '''Fencing.''' [[assertHeld]] re-reads the tip and throws
  *    [[LockLostException]] unless it still carries the holder's nonce.
  *    [[graft.lambda.Lambda]] calls it immediately before every publish
  *    inside the locked section, so a live-but-slow holder that was
  *    usurped (GC pause, straggler stage — plausible in a >15 min 100-TB
  *    partition rewrite) ABORTS instead of last-writer-winning. The
  *    snapshot layer's own tip CAS ([[graft.ops.SnapshotTable
  *    .overwritePartitionsCas]]) backs this as defense in depth.
  *  - '''Heartbeat renewal.''' A daemon thread republishes `held` with a
  *    fresh timestamp every ttl/3, so a healthy long-running holder never
  *    goes stale — the TTL only ever fires on a genuinely crashed (or
  *    wholly paused) process. The tip records the HOLDER's ttl and takers
  *    judge staleness by it, so processes configured with different TTLs
  *    share a warehouse safely (a short-TTL taker cannot usurp a healthy
  *    long-TTL holder between its beats). Staleness compares the
  *    publisher's wall clock against the reader's: the scheme assumes
  *    cross-node clock skew ≪ ttl (minutes), the standard TTL-lease
  *    assumption.
  *
  * Reference analog: the Synapse engine's MERGE/DELETE run under real
  * lock management (`12_trip_clean.dedupe_load.sql` executes inside the
  * warehouse's transaction manager); this is that contract rebuilt from
  * lease + fencing-token primitives (Chubby/ZooKeeper lease literature,
  * public knowledge).
  */
final class LaneLock private (fs: FileSystem, conf: Configuration,
                              lockDir: Path, val nonce: String, ttlMs: Long,
                              renew: Boolean) {

  private val released = new AtomicBoolean(false)

  private val heartbeat: Option[Thread] =
    if (!renew) None
    else Some {
      val t = new Thread(() => {
        // renew at ttl/3: two consecutive missed beats still leave slack
        // before a taker's staleness judgment fires
        while (!released.get()) {
          try Thread.sleep(math.max(50L, ttlMs / 3))
          catch { case _: InterruptedException => () }
          if (!released.get()) {
            // a transient FS error must not kill the beat (a dead beater
            // lets a HEALTHY holder go stale): swallow and retry next tick
            try LaneLock.readTip(fs, lockDir) match {
              case Some(t0) if t0.held && t0.nonce == nonce =>
                // lost CAS = a concurrent beat/taker moved the tip; the
                // next iteration re-reads and re-judges
                LaneLock.tryPublish(fs, conf, lockDir, t0.version + 1,
                  held = true, nonce, ttlMs): Unit
              case _ => released.set(true) // usurped: stop beating
            } catch { case _: Exception => () }
          }
        }
      }, s"lane-lock-heartbeat-$nonce")
      t.setDaemon(true)
      t.start()
      t
    }

  /** Fencing check: the tip still carries this holder's nonce. Called
    * before every publish inside the locked section. A failed fence is a
    * durable `fenced_abort` telemetry event — the victim's own record of
    * the usurpation, queryable across processes ([[LaneLock.events]]). */
  def assertHeld(): Unit = {
    val tip = LaneLock.readTip(fs, lockDir)
    if (!tip.exists(t => t.held && t.nonce == nonce)) {
      LaneLock.logEvent(fs, lockDir, "fenced_abort", nonce,
        s"tip=${tip.map(t => s"v${t.version} ${t.nonce}").getOrElse("none")}")
      throw new LockLostException(
        s"lane lock usurped (tip=${tip.map(t => s"v${t.version} ${t.nonce}")
          .getOrElse("none")}, holder=$nonce): aborting before publish")
    }
  }

  /** Release-only-if-owner: publish `released` while the tip is still
    * ours; if we were usurped, do nothing (the usurper owns the lock). */
  def release(): Unit = {
    released.set(true)
    heartbeat.foreach(_.interrupt())
    var done = false
    while (!done) {
      LaneLock.readTip(fs, lockDir) match {
        case Some(t) if t.held && t.nonce == nonce =>
          done = LaneLock.tryPublish(fs, conf, lockDir, t.version + 1,
            held = false, nonce, ttlMs)
        // lost CAS: loop — either our heartbeat's last beat won the slot
        // (re-read, release over it) or a taker usurped (stop)
        case _ => done = true
      }
    }
  }
}

object LaneLock {

  /** `ttlMs` is the HOLDER's lease length, recorded in the tip so a
    * taker judges staleness by the holder's own contract — two processes
    * configured with different TTLs would otherwise let the shorter one
    * usurp a healthy holder between its (ttl/3-spaced) heartbeats. */
  private[graft] final case class Tip(version: Long, held: Boolean,
                                       nonce: String, ts: Long, ttlMs: Long)

  private val versionRe = "v(\\d{8})".r

  private[graft] def readTip(fs: FileSystem, lockDir: Path): Option[Tip] = {
    if (!fs.exists(lockDir)) return None
    // only the MAX version is ever opened, and cleanup keeps an 8-version
    // margin below the tip, so list-then-open races a reap only when a
    // reader stalls across ≥8 publishes — re-list rather than surface a
    // spurious FileNotFound to the lease logic
    val vs = fs.listStatus(lockDir).toSeq.map(_.getPath.getName).collect {
      case versionRe(d) => d.toLong
    }.sorted
    vs.lastOption.map { v =>
      val txt =
        try {
          val in = fs.open(new Path(lockDir, f"v$v%08d"))
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        } catch {
          case _: java.io.FileNotFoundException => return readTip(fs, lockDir)
        }
      // unparseable = treat as a live hold by nobody we know; the TTL
      // path recovers (ts 0 + ttl 0 is maximally stale)
      val fallback = Tip(v, held = true, nonce = "?", ts = 0L, ttlMs = 0L)
      try txt.trim.split("\\s+") match {
        case Array(state, nonce, ts, ttl) =>
          Tip(v, state == "held", nonce, ts.toLong, ttl.toLong)
        case _ => fallback
      } catch { case _: NumberFormatException => fallback }
    }
  }

  private[graft] def tryPublish(fs: FileSystem, conf: Configuration,
      lockDir: Path, v: Long, held: Boolean, nonce: String,
      ttlMs: Long): Boolean = {
    val state = if (held) "held" else "released"
    val won = AtomicPublish.publishContent(fs, conf, lockDir,
      new Path(lockDir, f"v$v%08d"),
      s"$state $nonce ${System.currentTimeMillis()} $ttlMs")
    // bounded chain: reap the one version falling out of the 8-slot
    // margin (readers only open the max; the margin keeps any in-flight
    // list-then-open valid) — ONE delete per publish, so a heartbeat at
    // ttl/3 costs one RPC per beat, not a 24-slot sweep; [[acquire]] runs
    // the wide sweep once per acquisition to heal crash gaps. Reaping
    // re-OPENS the deleted slot for the publish-no-overwrite CAS, which is
    // why every acquisition win is re-validated against the re-read tip
    // ([[acquire]]) — a publish into a reaped below-tip slot "wins" the
    // file but never the lock.
    if (won && v > 8)
      try fs.delete(new Path(lockDir, f"v${v - 8}%08d"), false): Unit
      catch { case _: Exception => () }
    won
  }

  /** Crash-gap healing: delete every slot that actually EXISTS at least
    * 8 below `tip`. Run once per acquisition (not per publish). Listing
    * first (one RPC) keeps the steady state at zero deletes and — unlike
    * a fixed window — reaches slots leaked by transiently-failed
    * per-publish deletes however far below the tip they sit, so the
    * chain's file count stays bounded across arbitrarily long holds. */
  private def sweepBelow(fs: FileSystem, lockDir: Path, tip: Long): Unit =
    try fs.listStatus(lockDir).toSeq.map(_.getPath.getName).collect {
      case versionRe(d) if d.toLong <= tip - 8 => d.toLong
    }.foreach { old =>
      try fs.delete(new Path(lockDir, f"v$old%08d"), false): Unit
      catch { case _: Exception => () }
    } catch { case _: Exception => () }

  /** One acquisition attempt from an OBSERVED (possibly stale) tip:
    * publish `tip+1` as held, then validate the win against the RE-READ
    * tip. The validation is what makes the slot reaping sound: a taker
    * that stalled between its tip read and its publish can win a slot the
    * reap re-opened BELOW the live tip — the file-level "win" is then
    * meaningless (readers only ever open the max version), and without
    * re-validation the taker would believe it holds a lock another
    * process owns. A genuine win re-reads as `held` by this nonce: the
    * only way the tip moves off a fresh `held` tip within the validation
    * window is a taker judging it stale, which needs a full TTL — not
    * microseconds. (The heartbeat/release paths need no such check: a
    * below-tip junk win there is ignored by every reader and reaped by
    * later publishes, and both re-read the tip each iteration.) */
  private[graft] def tryAcquireFrom(fs: FileSystem, conf: Configuration,
      lockDir: Path, tip: Option[Tip], nonce: String, ttlMs: Long): Boolean = {
    val v = tip.map(_.version).getOrElse(0L) + 1
    tryPublish(fs, conf, lockDir, v, held = true, nonce, ttlMs) && {
      // the validation read retries transient FS errors: at this point the
      // held tip may already be PUBLISHED, so surfacing a blip here would
      // orphan a won lock (no handle → no heartbeat, no release — every
      // taker then waits out the full TTL against a lock nobody holds)
      var attempt = 0
      var verdict = Option.empty[Boolean]
      while (verdict.isEmpty) {
        try verdict = Some(
          readTip(fs, lockDir).exists(t => t.held && t.nonce == nonce))
        catch {
          case e: Exception =>
            attempt += 1
            if (attempt >= 5) {
              // the held tip may already be PUBLISHED: rethrowing now
              // orphans a won lock (no handle → no heartbeat/release,
              // every taker waits out the full TTL). Best-effort release
              // first — if our publish was real, v+1 `released` frees the
              // lock immediately; if it landed in reaped below-tip junk,
              // the extra junk slot is equally ignored and reaped.
              try tryPublish(fs, conf, lockDir, v + 1, held = false,
                nonce, ttlMs): Unit
              catch { case _: Exception => () }
              throw e // persistent FS failure: TTL is the last resort
            }
            Thread.sleep(100)
        }
      }
      verdict.get
    }
  }

  /** Margin beyond which a held tip's timestamp sitting in the taker's
    * FUTURE is judged clock skew (holder's clock ahead). The lease math
    * (`now - ts > ttl`) can never fire on a future ts anyway — this guard
    * makes the refusal EXPLICIT and observable instead of reading as a
    * mysteriously long wait: the taker logs once, counts
    * [[skewRefusals]], and writes a durable `skew_refusal` event
    * ([[events]]), so a mis-synced fleet surfaces in CROSS-PROCESS ops
    * telemetry rather than as takeover latency. */
  private[graft] val SkewMarginMs = 5000L

  /** Takeover refusals attributed to publisher-clock-ahead skew —
    * in-process counter (test observability); the durable record every
    * process can query is the `skew_refusal` event file. */
  private[graft] val skewRefusals = new java.util.concurrent.atomic.AtomicLong(0)

  /** Lock telemetry schema: one tiny JSON file per EVENT under
    * `<warehouse>/_lock_events/` (VERDICT r17 #5). Events are written
    * through the lock's own FileSystem — durable and visible to every
    * process sharing the warehouse, unlike a JVM counter — and they are
    * deliberately NOT Spark writes: the lock guards Spark commits, so its
    * own failure telemetry must not depend on launching a Spark job
    * mid-abort. Files are staged dot-prefixed then renamed in (unique
    * names — no CAS needed); all writes are best-effort (telemetry must
    * never break the protocol). Kinds: `takeover` (a taker usurped a
    * stale held tip; detail carries the victim nonce), `fenced_abort`
    * (a usurped holder's fence fired before a publish), `skew_refusal`
    * (takeover refused on a future-stamped tip), `usurped_retry`
    * (a production locked section re-running after a usurpation). */
  private[graft] val EventsDirName = "_lock_events"

  /** Minimal JSON string escape (ADVICE r18): a quote/backslash/control
    * char in a nonce or detail must not corrupt the row — the proc
    * soak's ok-gate parses these best-effort files, and a silently
    * nulled row is a lost takeover record. */
  private def jstr(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[graft] def logEvent(fs: FileSystem, lockDir: Path, event: String,
                              nonce: String, detail: String): Unit =
    try {
      val dir = new Path(lockDir.getParent, EventsDirName)
      fs.mkdirs(dir)
      val name = s"${System.currentTimeMillis()}-$event-" +
        s"${UUID.randomUUID().toString.take(8)}.json"
      val body = s"""{"event":"${jstr(event)}","nonce":"${jstr(nonce)}",""" +
        s""""detail":"${jstr(detail)}","ts":${System.currentTimeMillis()},""" +
        s""""pid":${ProcessHandle.current().pid()}}"""
      val tmp = new Path(dir, s".$name")
      val out = fs.create(tmp, false)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.rename(tmp, new Path(dir, name)): Unit
    } catch { case _: Exception => () }

  /** [[logEvent]] addressed by warehouse dir — the entry production
    * sections use for `usurped_retry` (they hold no lock handle while
    * retrying). */
  private[graft] def logWarehouseEvent(spark: SparkSession, whDir: String,
      event: String, nonce: String, detail: String): Unit = {
    val lockDir = new Path(s"$whDir/_lane_lock.d")
    logEvent(lockDir.getFileSystem(spark.sparkContext.hadoopConfiguration),
      lockDir, event, nonce, detail)
  }

  /** The queryable lock-telemetry surface: every event any process wrote
    * against this warehouse, as a DataFrame. Empty (correct schema) when
    * nothing has ever been recorded. */
  def events(spark: SparkSession, whDir: String): org.apache.spark.sql.DataFrame = {
    val dir = new Path(s"$whDir/${EventsDirName}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event STRING, nonce STRING, detail STRING, ts BIGINT, pid BIGINT")
    if (!fs.exists(dir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(dir.toString)
  }

  /** Block until this process owns the lock. `renew = false` disables the
    * heartbeat (tests use it to simulate a wholly paused holder). */
  def acquire(spark: SparkSession, whDir: String, ttlMs: Long,
              renew: Boolean = true): LaneLock = {
    val conf = spark.sparkContext.hadoopConfiguration
    val lockDir = new Path(s"$whDir/_lane_lock.d")
    val fs = lockDir.getFileSystem(conf)
    AtomicPublish.requireSupported(fs) // loud at open, like the tables
    fs.mkdirs(lockDir)
    val nonce = UUID.randomUUID().toString
    var skewLogged = false
    while (true) {
      val tip = readTip(fs, lockDir)
      // staleness is judged by the HOLDER's recorded lease, not this
      // taker's: processes with different TTLs can share a warehouse
      // without the shortest one usurping a healthy holder between its
      // heartbeats (the tip of a pre-TTL-field writer reads ttl 0 —
      // maximally stale, recovered by the nonce/fence discipline).
      // Clock-skew guard: a held tip stamped in OUR future beyond the
      // margin is a mis-synced publisher clock — refuse takeover and say
      // so (the lease compares publisher vs reader wall clocks; the
      // scheme assumes skew ≪ ttl, and this is where a violation shows).
      val now = System.currentTimeMillis()
      val skewed = tip.exists(t => t.held && t.ts - now > SkewMarginMs)
      if (skewed && !skewLogged) {
        skewLogged = true
        skewRefusals.incrementAndGet()
        logEvent(fs, lockDir, "skew_refusal", nonce,
          s"tip_nonce=${tip.get.nonce} tip_ts_ahead_ms=${tip.get.ts - now}")
        System.err.println(s"[LaneLock] refusing takeover at $lockDir: held " +
          s"tip ts is ${tip.get.ts - now} ms in this taker's future " +
          "(publisher clock ahead?) — waiting, not usurping")
      }
      val free = !skewed && tip.forall(t => !t.held || now - t.ts > t.ttlMs)
      if (free) {
        if (tryAcquireFrom(fs, conf, lockDir, tip, nonce, ttlMs)) {
          // acquiring OVER a stale held tip is a takeover — the taker's
          // durable record of the usurpation, paired with the victim's
          // fenced_abort when it was merely paused rather than dead
          tip.filter(_.held).foreach(t => logEvent(fs, lockDir, "takeover",
            nonce, s"victim=${t.nonce} stale_ms=${now - t.ts} ttl_ms=${t.ttlMs}"))
          sweepBelow(fs, lockDir, tip.map(_.version).getOrElse(0L) + 1)
          return new LaneLock(fs, conf, lockDir, nonce, ttlMs, renew)
        }
        // lost the slot to a racer, or won a reaped below-tip slot (the
        // post-win validation rejected it): loop re-reads the new tip
      } else Thread.sleep(200)
    }
    throw new IllegalStateException("unreachable")
  }
}
