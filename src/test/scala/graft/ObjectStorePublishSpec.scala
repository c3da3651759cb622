package graft

import java.util.concurrent.CyclicBarrier

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.lambda.LaneLock
import graft.ops.{AtomicPublish, SnapshotTable}

/** Object-store conformance for the publish CAS (VERDICT r16 #1): the
  * whole correctness stack — manifest commits, snapshot-tip CAS, the lane
  * lock chain — rests on [[AtomicPublish]]'s publish-no-overwrite. The
  * reference deployment's lake is an object store (ADLS;
  * `infra/terraform/main.tf`), exactly the store class where rename is
  * NOT that primitive. This spec drives a SIMULATED hostile store
  * ([[MockObjectStoreFileSystem]]: rename silently replaces, conditional
  * PUT available) and proves (a) the CAS contract holds end-to-end via
  * the conditional-PUT strategy — raced at the file, table and lock
  * layers — and (b) a store that cannot honor the contract fails LOUDLY
  * at table/lock open, never silently last-writer-wins. */
class ObjectStorePublishSpec extends SparkSpec {

  private lazy val conf = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.mockput.impl", classOf[MockObjectStoreFileSystem].getName)
    c.set("fs.mocknone.impl", classOf[MockNoAtomicFileSystem].getName)
    c.set("fs.mockreg.impl", classOf[MockRegisterSeamFileSystem].getName)
    c
  }

  private def storeDir(prefix: String, scheme: String = "mockput"): String =
    s"$scheme://${tmpDir(prefix)}"

  private def fsOf(dir: String): FileSystem = {
    conf: Unit // force registration before first FileSystem.get
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  private def readBytes(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Barrier-race `n` bodies on real threads; rethrows the first error. */
  private def racing[T](n: Int)(body: Int => T): Seq[T] = {
    val barrier = new CyclicBarrier(n)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, T]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until n).map { i =>
      new Thread(() =>
        try { barrier.await(); results.put(i, body(i)): Unit }
        catch { case t: Throwable => errs.add(t): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"racer errored: ${errs.toArray.mkString(", ")}")
    (0 until n).map(results.get)
  }

  test("strategy resolution: conditional PUT auto-detected; local link kept; " +
      "a store with neither fails LOUDLY (never the unsound rename fallback)") {
    val put = fsOf(storeDir("ospub_resolve"))
    assert(AtomicPublish.strategyFor(put) eq AtomicPublish.ConditionalPutStrategy)
    val local = new Path(tmpDir("ospub_local"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(AtomicPublish.strategyFor(local) eq AtomicPublish.PosixLink)
    val none = fsOf(storeDir("ospub_none", "mocknone"))
    val e = intercept[UnsupportedOperationException] {
      AtomicPublish.strategyFor(none)
    }
    assert(e.getMessage.contains("mocknone"))
    assert(e.getMessage.contains("last-writer-wins"))
  }

  test("the hostile store's rename silently replaces an existing file — " +
      "the documented reason rename may not carry the CAS here") {
    val dir = storeDir("ospub_hostile")
    val fs = fsOf(dir)
    def write(name: String, s: String): Path = {
      val p = new Path(dir, name)
      val out = fs.create(p, false)
      out.write(s.getBytes("UTF-8")); out.close(); p
    }
    val target = write("target", "WINNER")
    val late = write("late", "LOSER")
    // a sound no-overwrite rename would throw/false here; the store
    // "succeeds" and destroys the winner — last-writer-wins
    assert(fs.rename(late, target))
    assert(readBytes(fs, target) == "LOSER")
  }

  test("conditional-PUT CAS: barrier-raced publishers to ONE target — " +
      "exactly one wins and its exact bytes survive") {
    val dir = storeDir("ospub_race")
    val fs = fsOf(dir)
    val n = 8
    val wins = racing(n) { i =>
      val won = AtomicPublish.publishContent(fs,
        spark.sparkContext.hadoopConfiguration,
        new Path(dir), new Path(dir, "slot"), s"publisher-$i")
      (i, won)
    }
    assert(wins.count(_._2) == 1, s"exactly one winner: $wins")
    val winner = wins.find(_._2).get._1
    assert(readBytes(fs, new Path(dir, "slot")) == s"publisher-$winner")
    // every losing temp was cleaned up
    val leftovers = fs.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(leftovers.isEmpty, s"losing temps cleaned: ${leftovers.toSeq}")
  }

  test("snapshot table over the object store: commits, reads, and the " +
      "concurrent-append CAS behave exactly as on the local leg") {
    val dir = storeDir("ospub_table")
    conf: Unit
    val t = SnapshotTable(spark, s"$dir/t",
      org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING"))
    import spark.implicits._
    val writers = 4
    racing(writers) { i =>
      t.append(Seq((i, s"w$i")).toDF("k", "v"))
    }: Unit
    assert(t.versions == (1L to writers.toLong))
    val got = t.read.collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(got.toSeq == (0 until writers).map(i => (i, s"w$i")),
      "every racing append landed exactly once")
    // vacuum tombstones via the store's unconditional PUT: the slot stays
    // occupied (decided) while the version list retires it
    t.overwrite(Seq((99, "last")).toDF("k", "v")): Unit
    t.vacuum(keepVersions = 1, minAgeMs = 0L): Unit
    val fs = fsOf(dir)
    assert(fs.exists(new Path(s"$dir/t/_manifests/v00000001.json")),
      "retired slot still physically occupied")
    assert(t.versions == Seq(writers.toLong + 1))
    assert(t.read.collect().map(_.getString(1)).toSeq == Seq("last"))
  }

  test("snapshot-tip CAS on the object store: same-partition racers " +
      "serialize — one commits, one conflicts and re-derives") {
    val dir = storeDir("ospub_cas")
    conf: Unit
    val t = SnapshotTable(spark, s"$dir/t",
      org.apache.spark.sql.types.StructType.fromDDL("p INT, v STRING"), Seq("p"))
    import spark.implicits._
    t.overwritePartitions(Seq((1, "base")).toDF("p", "v")): Unit
    val base = t.latestVersion
    // writer A commits against base first; writer B (same partition, same
    // base) must see the conflict and re-derive rather than erase A
    assert(t.overwritePartitionsCas(Seq((1, "A")).toDF("p", "v"), base).isDefined)
    assert(t.overwritePartitionsCas(Seq((1, "B")).toDF("p", "v"), base).isEmpty,
      "stale-base same-partition commit refused")
    val retried = t.overwritePartitionsCas(
      Seq((1, "B2")).toDF("p", "v"), t.latestVersion)
    assert(retried.isDefined, "re-derived commit against the new tip lands")
    assert(t.read.collect().map(_.getString(1)).toSeq == Seq("B2"))
  }

  test("lane lock chain runs on conditional PUT: two takers race one " +
      "free lock — one winner; release hands over cleanly") {
    val whDir = storeDir("ospub_lock")
    conf: Unit
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    racing(2) { i =>
      val l = LaneLock.acquire(spark, whDir, ttlMs = 60000L)
      order.add(s"t$i")
      l.assertHeld() // fence green while held
      l.release()
    }: Unit
    assert(order.size == 2, "both takers eventually acquired (serialized)")
  }

  test("a store with NO atomic publish fails loudly at table open and " +
      "at lock open — before any commit protocol starts") {
    val dir = storeDir("ospub_reject", "mocknone")
    conf: Unit
    intercept[UnsupportedOperationException] {
      SnapshotTable(spark, s"$dir/t",
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
    }
    intercept[UnsupportedOperationException] {
      LaneLock.acquire(spark, dir, ttlMs = 1000L)
    }
  }

  test("an explicit register() binds a scheme that would otherwise be " +
      "refused — the deployment seam for real SDK adapters") {
    // 'mockreg' is DEDICATED to registration tests: registering over
    // 'mocknone' would let the loud-rejection cases race the registered
    // window if suites ever run concurrently in one JVM
    val dir = storeDir("ospub_register", "mockreg")
    val fs = fsOf(dir)
    // a deployment adapter could route to its SDK's conditional write;
    // binding the sound local strategy here proves the seam is honored
    AtomicPublish.register("mockreg", AtomicPublish.PosixLink)
    try {
      assert(AtomicPublish.strategyFor(fs) eq AtomicPublish.PosixLink)
      val t = SnapshotTable(spark, s"$dir/t",
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
      import spark.implicits._
      t.append(Seq(1).toDF("k")): Unit
      assert(t.read.count() == 1)
    } finally
      // unbind so a later registration test starts from the refused state
      AtomicPublish.unregister("mockreg")
  }

  test("generic publish leg with a LOCAL-FS temp: the hostile store pays " +
      "exactly one conditional PUT and zero GETs (VERDICT r18 #6)") {
    // external callers of publish(tmp, …) used to stage the temp on the
    // store itself — PUT+GET+buffer per commit; the leg now resolves the
    // temp through ITS OWN FileSystem, so local staging costs the store
    // only the one conditional PUT the contract promises
    val dir = storeDir("ospub_localtmp")
    val fs = fsOf(dir)
    val localTmp = new Path(s"file:${tmpDir("ospub_stage")}/stage.json")
    val lfs = localTmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = lfs.create(localTmp, false)
    out.write("content-v1".getBytes("UTF-8")); out.close()
    val target = new Path(dir, "slot")
    val (g0, p0) = (MockObjectStoreFileSystem.gets.get(),
      MockObjectStoreFileSystem.condPuts.get())
    assert(AtomicPublish.publish(fs, spark.sparkContext.hadoopConfiguration,
      localTmp, target), "locally-staged publish wins the empty slot")
    assert(MockObjectStoreFileSystem.condPuts.get() - p0 == 1L &&
      MockObjectStoreFileSystem.gets.get() - g0 == 0L,
      "one conditional PUT, zero store GETs")
    assert(readBytes(fs, target) == "content-v1")
    assert(!lfs.exists(localTmp), "the local temp is consumed on a win")
    // a LOSS leaves the local temp for the caller (contract unchanged)
    val out2 = lfs.create(localTmp, false)
    out2.write("late".getBytes("UTF-8")); out2.close()
    assert(!AtomicPublish.publish(fs, spark.sparkContext.hadoopConfiguration,
      localTmp, target))
    assert(lfs.exists(localTmp) && readBytes(fs, target) == "content-v1")
    lfs.delete(localTmp, false): Unit
  }

  test("publishBytes dispatches on the DirectBytesPublish capability, not " +
      "strategy identity: a register()-ed conditional-put strategy keeps " +
      "the one-PUT contract (ADVICE r18)") {
    val dir = storeDir("ospub_capability", "mockreg")
    val fs = fsOf(dir)
    val stagedPublishes = new java.util.concurrent.atomic.AtomicLong(0)
    val directPublishes = new java.util.concurrent.atomic.AtomicLong(0)
    // a deployment's own strategy (an SDK adapter, not the built-in
    // singleton) that CAN publish bytes directly — the old identity
    // match silently sent it through the staged-temp leg
    object SdkAdapter extends AtomicPublish.Strategy
        with AtomicPublish.DirectBytesPublish {
      def publish(fs: FileSystem, conf: org.apache.hadoop.conf.Configuration,
                  tmp: Path, target: Path): Boolean = {
        stagedPublishes.incrementAndGet(): Unit
        AtomicPublish.PosixLink.publish(fs, conf, tmp, target)
      }
      def publishDirect(fs: FileSystem, target: Path,
                        content: Array[Byte]): Boolean = {
        directPublishes.incrementAndGet(): Unit
        AtomicPublish.PosixLink.publish(fs,
          spark.sparkContext.hadoopConfiguration, {
            val tmp = new Path(target.getParent,
              s".direct-${java.util.UUID.randomUUID()}")
            val o = fs.create(tmp, false)
            try o.write(content) finally o.close()
            tmp
          }, target)
      }
    }
    AtomicPublish.register("mockreg", SdkAdapter)
    try {
      val won = AtomicPublish.publishContent(fs,
        spark.sparkContext.hadoopConfiguration, new Path(dir),
        new Path(dir, "slot"), "direct-body")
      assert(won && readBytes(fs, new Path(dir, "slot")) == "direct-body")
      assert(directPublishes.get() == 1L && stagedPublishes.get() == 0L,
        "capability dispatch routed the registered strategy's direct leg")
    } finally AtomicPublish.unregister("mockreg")
  }

  test("replaceInPlace is a DECLARED contract: a registered publish-only " +
      "strategy throws (never infers overwrite-create safety); declaring " +
      "InPlaceReplace routes the same scheme") {
    val dir = storeDir("ospub_replace_seam", "mockreg")
    val fs = fsOf(dir)
    val slot = new Path(dir, "slot")
    // publish-only: the deployment registered how to PUBLISH but said
    // nothing about replace — vacuum must refuse, not assume
    object PublishOnly extends AtomicPublish.Strategy {
      def publish(fs: FileSystem, conf: org.apache.hadoop.conf.Configuration,
                  tmp: Path, target: Path): Boolean =
        AtomicPublish.PosixLink.publish(fs, conf, tmp, target)
    }
    AtomicPublish.register("mockreg", PublishOnly)
    try {
      assert(AtomicPublish.publishContent(fs,
        spark.sparkContext.hadoopConfiguration, new Path(dir), slot, "decided"))
      val e = intercept[UnsupportedOperationException] {
        AtomicPublish.replaceInPlace(fs, slot, "tomb".getBytes("UTF-8"))
      }
      assert(e.getMessage.contains("InPlaceReplace"))
      assert(readBytes(fs, slot) == "decided", "the refusal touched nothing")
      // the same scheme with the replace contract DECLARED routes cleanly
      object WithReplace extends AtomicPublish.Strategy
          with AtomicPublish.InPlaceReplace {
        def publish(fs: FileSystem, conf: org.apache.hadoop.conf.Configuration,
                    tmp: Path, target: Path): Boolean =
          AtomicPublish.PosixLink.publish(fs, conf, tmp, target)
        def replace(fs: FileSystem, target: Path, content: Array[Byte]): Unit = {
          val out = fs.create(target, true)
          try out.write(content) finally out.close()
        }
      }
      AtomicPublish.register("mockreg", WithReplace)
      AtomicPublish.replaceInPlace(fs, slot, "tomb".getBytes("UTF-8"))
      assert(readBytes(fs, slot) == "tomb")
    } finally AtomicPublish.unregister("mockreg")
  }

  test("a decided slot never reverts to winnable mid-replace: raced " +
      "tombstone replaces vs late publishers, on BOTH store classes") {
    val cases = Seq(
      "conditional-PUT store" -> storeDir("ospub_replace_race"),
      "POSIX link store" -> tmpDir("ospub_replace_race_local"))
    cases.foreach { case (label, dir) =>
      val fs = fsOf(dir)
      val slot = new Path(dir, "slot")
      val hconf = spark.sparkContext.hadoopConfiguration
      assert(AtomicPublish.publishContent(fs, hconf, new Path(dir), slot,
        "decided"), s"$label: seeding the decided slot")
      val lateWins = new java.util.concurrent.atomic.AtomicLong(0)
      // 1 replacer folding the slot to tombstones 100x; 3 late publishers
      // hammering the publish CAS throughout — the replace contract says
      // the slot NEVER reads absent, so no publish may ever win it
      racing(4) { i =>
        if (i == 0)
          (1 to 100).foreach(n => AtomicPublish.replaceInPlace(fs, slot,
            s"tomb-$n".getBytes("UTF-8")))
        else
          (1 to 100).foreach { n =>
            if (AtomicPublish.publishContent(fs, hconf, new Path(dir), slot,
                s"late-$i-$n"))
              lateWins.incrementAndGet(): Unit
          }
      }: Unit
      assert(lateWins.get() == 0L,
        s"$label: a late publisher won a decided slot mid-replace")
      assert(readBytes(fs, slot) == "tomb-100",
        s"$label: the final replace content survives")
    }
  }

  test("ingest batch commit protocol converges on the object store: " +
      "replay is a no-op, the marker commit point rides the conditional PUT") {
    import org.apache.spark.sql.functions._
    val base = storeDir("ospub_ingest")
    conf: Unit
    val dirs = graft.stream.Ingest.LakeDirs(raw = s"$base/raw",
      curated = s"$base/curated", dlq = s"$base/dlq", checkpoint = s"$base/chk")
    val batch = graft.model.EventsModel.envelopes(spark, sf()).select("json")
      .limit(200)
      .withColumn("arrival_ts",
        get_json_object(col("json"), "$.producer_ts").cast("timestamp_ntz"))
    graft.stream.Ingest.writeBatch(batch, dirs, batchId = 3L)
    val raw1 = spark.read.text(dirs.raw).count()
    assert(raw1 == 200L, "every record landed through the store")
    // replay of the same batch: the conditional-PUT marker skips all sinks
    graft.stream.Ingest.writeBatch(batch, dirs, batchId = 3L)
    assert(spark.read.text(dirs.raw).count() == raw1, "no double-landing")
    val fs = fsOf(base)
    assert(fs.exists(new Path(s"${dirs.raw}/_graft_commits/batch-3")),
      "marker present — published via the store's conditional PUT")
  }
}
