package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialization of shared intermediates.
  *
  * The reference materializes `core.trip_clean` / `mdl.fact_trip` once per
  * run and every downstream statement reads the table; the declared
  * queries are independent programs over the same fixtures, so without
  * this each would rebuild the whole chain.
  *
  * Two tiers, by design:
  *
  *  - '''Disk tier (always)''': a scratch-parquet table (the same
  *    write-once read-many pattern as [[graft.batch.Runner]]), NOT a bare
  *    `cache()` of the chain: cached blocks evict under memory pressure
  *    and every consumer then silently re-pays the whole upstream chain —
  *    at 100 TB that turns O(1) reuse into O(chain) per query. The worst
  *    case for any consumer is a columnar re-scan of the materialized
  *    result, with column pruning and pushdown intact (which a cached
  *    block read does not give), absorbed by the OS page cache.
  *
  *  - '''Memory tier (admitted)''': the read-back scan is additionally
  *    pinned in the SQL in-memory cache ONLY while the aggregate pinned
  *    estimate fits a storage-pool budget (see [[admit]]). Unbounded
  *    pinning is the measured round-12 failure mode (SCALING.md): at x20
  *    the aggregate columnar working set (~10+ GB) exceeds one JVM's
  *    storage pool, `MEMORY_AND_DISK` blocks churn between the disk
  *    store and memory (each read re-promotes blocks and evicts others),
  *    and 8 sub-second queries read 3–12 s IN-SUITE while their isolated
  *    steady state stayed ~1 s. Refusing the pin past the budget keeps
  *    those reads on the pruning-friendly parquet scan — bounded,
  *    page-cache-warm, and churn-free. On a cluster the storage pool
  *    scales with executors, so the budget simply stops binding.
  *
  * Entries are keyed by a per-session TOKEN as well, so a harness that
  * rebuilds its session never sees a frame bound to a stopped one.
  * Tokens (not `System.identityHashCode`) close the r13-ADVICE leak:
  * identity hashes are reusable after GC, so a dead session's budget
  * reservations could silently shrink a NEW session's pin budget, and
  * nothing ever evicted them. Tokens are unique per live session
  * (WeakHashMap), and [[sweep]] drops every structure owned by a
  * session that is GC'd or stopped. */
object Memo {
  private val frames = TrieMap.empty[(String, String), DataFrame]
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Object]()

  /** session -> token, weak on the session so a discarded session's
    * entry vanishes with it; liveSessions is the reverse index the
    * sweeper walks (TrieMap iteration is snapshot-safe). */
  private val sessionTokens = new java.util.WeakHashMap[SparkSession, String]()
  private val liveSessions =
    TrieMap.empty[String, java.lang.ref.WeakReference[SparkSession]]

  private def token(spark: SparkSession): String = {
    val t = sessionTokens.synchronized {
      var v = sessionTokens.get(spark)
      if (v == null) {
        v = java.util.UUID.randomUUID().toString
        sessionTokens.put(spark, v)
      }
      // (re-)register for sweeping: a session swept once (e.g. seen
      // stopped mid-harness) but touched again must stay tracked, or
      // its new structures would accumulate untracked forever
      if (!liveSessions.contains(v))
        liveSessions.put(v, new java.lang.ref.WeakReference(spark))
      v
    }
    sweep()
    t
  }

  /** Test seam: clear a session's weak reference so the next [[sweep]]
    * treats it as GC'd — the only way to exercise the eviction path
    * deterministically (a real GC-clear is nondeterministic, and
    * stopping the shared test SparkContext would kill the suite). */
  private[graft] def simulateSessionCollected(spark: SparkSession): Unit =
    sessionTokens.synchronized {
      Option(sessionTokens.get(spark))
        .flatMap(liveSessions.get).foreach(_.clear())
    }

  /** Test/diagnostic hook: whether any memo structure is still keyed to
    * the session (frames, locks, or pin reservations). */
  private[graft] def hasEntriesFor(spark: SparkSession): Boolean =
    sessionTokens.synchronized(Option(sessionTokens.get(spark))).exists { t =>
      frames.keys.exists(_._1 == t) || pinnedEst.keys.exists(_._1 == t) ||
        locks.keySet.stream().anyMatch(_._1 == t)
    }

  /** Evict every memo structure owned by a dead session — GC'd (weak ref
    * cleared) or explicitly stopped. Long-lived harnesses that cycle
    * sessions neither leak frames/reservations nor have a stale
    * reservation charged against a new session's budget. Cheap: map
    * sizes are O(sessions x memo keys), both small. */
  private def sweep(): Unit =
    liveSessions.foreach { case (t, ref) =>
      val s = ref.get()
      if (s == null || s.sparkContext.isStopped) {
        frames.keys.filter(_._1 == t).foreach(frames.remove)
        pinnedEst.keys.filter(_._1 == t).foreach(pinnedEst.remove)
        // Locks only die with the session OBJECT (weak ref cleared): a
        // stopped-but-still-reachable session can keep issuing memo
        // calls, and evicting its lock would let a concurrent caller
        // computeIfAbsent a FRESH lock for the same key and race the
        // first builder on one scratch path — the overwrite the lock
        // exists to prevent. The liveSessions entry stays too, so a
        // later sweep sees the token again once GC clears the ref.
        if (s == null) {
          liveSessions.remove(t)
          locks.keySet.removeIf(_._1 == t)
        }
      }
    }

  /** One scratch dir per JVM; harmless to leave behind (tmp), and keyed
    * paths make concurrent sessions non-colliding. */
  private lazy val scratch: String =
    java.nio.file.Files.createTempDirectory("graft-memo").toString

  private def sanitize(key: String): String =
    key.replaceAll("[^A-Za-z0-9._-]", "_")

  // ---- memory-tier admission ----------------------------------------

  /** Estimated in-memory columnar bytes per scratch-parquet byte.
    * Both representations are compressed-columnar (parquet snappy vs
    * `InMemoryRelation`'s dictionary/RLE builders), but the in-memory
    * form keeps wider encodings and per-batch bookkeeping; 3x is the
    * conservative side of the 1.5–3x range observed on the text-heavy
    * chains. Estimates only steer admission — being 2x wrong shifts the
    * cutoff, it never OOMs (the heap floor below guards the build). */
  private val ColumnarFactor = 3L

  /** Admitted pins: (session token, key) -> estimated columnar bytes.
    * Reservations are what [[healed]] consults, so a pin survives an
    * external `clearCache()` without re-running admission. */
  private val pinnedEst = TrieMap.empty[(String, String), Long]
  private val admission = new Object

  private def dirBytes(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    val s = java.nio.file.Files.walk(p)
    try s.filter(q => java.nio.file.Files.isRegularFile(q))
      .mapToLong(q => java.nio.file.Files.size(q)).sum()
    finally s.close()
  }

  /** Aggregate pin budget: the storage-protected half of the unified
    * memory region (`(heap - 300 MB reserved) x spark.memory.fraction x
    * spark.memory.storageFraction`). Pinning past the protected half is
    * exactly where storage/execution contention — and the round-12
    * disk-store churn — begins. `-Dgraft.memo.budgetBytes=N` overrides
    * (probes and the admission spec); a non-numeric value warns once and
    * falls back, same contract as the cache override. */
  private def pinBudgetBytes(spark: SparkSession): Long =
    sys.props.get("graft.memo.budgetBytes").flatMap { raw =>
      val parsed = raw.trim.toLongOption
      if (parsed.isEmpty && warnedValues.putIfAbsent(raw, ()).isEmpty)
        System.err.println(
          s"[graft.Memo] non-numeric graft.memo.budgetBytes '$raw' — using the storage-pool heuristic")
      parsed
    }.getOrElse {
      val conf = spark.sparkContext.getConf
      val fraction = conf.getDouble("spark.memory.fraction", 0.6)
      val storage = conf.getDouble("spark.memory.storageFraction", 0.5)
      val usable = Runtime.getRuntime.maxMemory() - 300L * 1024 * 1024
      math.max(0L, (usable * fraction * storage).toLong)
    }

  /** No single frame may take more than a quarter of the budget: the
    * frames that blow the budget are exactly the ones whose pin buys the
    * least (a multi-GB chain read is bandwidth-bound either way, and the
    * page cache already holds its scratch file), while many small hot
    * frames fit comfortably beside each other. */
  private val PerFrameShare = 4L

  /** Whether pinning in the SQL in-memory cache is SAFE on this
    * session's memory geometry.
    *
    * The cache's columnar build (`InMemoryRelation` → `ColumnBuilder`)
    * grows ~batchSize rows of UNMANAGED heap per column per task before
    * the block ever reaches the spill-capable MemoryStore; with
    * document-text columns (KBs/row) and every core building a cache
    * partition at once, that allocation sits outside Spark's memory
    * accounting entirely and cannot spill. Measured on the x20 fixtures
    * (SPILL_PROBE, local[32]): 96 MB heap/core OOM-kills the whole JVM
    * inside the docs-chain cache build, 128 MB/core completes the full
    * probe. Below a 192 MB/core floor (0.5x margin over the measured
    * failure) the memo therefore skips the pin. */
  private val cacheFloorBytesPerCore = 192L * 1024 * 1024
  private def heapSafe(df: DataFrame): Boolean = {
    val cores = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    Runtime.getRuntime.maxMemory() / cores >= cacheFloorBytesPerCore
  }

  /** Explicit override for probes: `-Dgraft.memo.cache=always|never` (or
    * env `GRAFT_MEMO_CACHE`), case-insensitive. Any other value warns
    * ONCE per raw string and falls through to the heuristics — a typo'd
    * override must not silently change probe semantics. */
  private val warnedValues = TrieMap.empty[String, Unit]
  private def overridePref: Option[Boolean] =
    sys.props.get("graft.memo.cache")
      .orElse(sys.env.get("GRAFT_MEMO_CACHE")).flatMap { raw =>
        raw.trim.toLowerCase match {
          case "always" => Some(true)
          case "never"  => Some(false)
          case _ =>
            if (warnedValues.putIfAbsent(raw, ()).isEmpty)
              System.err.println(
                s"[graft.Memo] unrecognized graft.memo.cache/GRAFT_MEMO_CACHE " +
                  s"value '$raw' (expected always|never) — using the heap/budget heuristic")
            None
        }
      }

  /** Test/diagnostic hook: the admitted columnar estimate for a key, if
    * its pin was admitted. */
  private[graft] def pinnedEstimate(spark: SparkSession, key: String): Option[Long] =
    pinnedEst.get((token(spark), key))

  /** Admission = override, else heap floor AND budget fit. Reserves the
    * estimate on success (under one lock: racing materializations of
    * different keys must not both think the last slot is theirs). */
  private def admit(df: DataFrame, k: (String, String), est: Long): Boolean =
    admission.synchronized {
      val ok = overridePref.getOrElse {
        heapSafe(df) && {
          val budget = pinBudgetBytes(df.sparkSession)
          val used = pinnedEst.iterator
            .collect { case ((s, _), b) if s == k._1 => b }.sum
          est <= budget / PerFrameShare && used + est <= budget
        }
      }
      if (ok) pinnedEst.put(k, est) else pinnedEst.remove(k)
      ok
    }

  /** Write once, read back, pin the read-back scan if admitted. */
  private def materialize(df: DataFrame, k: (String, String)): DataFrame = {
    val path = s"$scratch/${k._1}_${sanitize(k._2)}"
    df.write.mode("overwrite").parquet(path)
    val back = df.sparkSession.read.parquet(path)
    if (admit(back, k, dirBytes(path) * ColumnarFactor)) back.cache()
    back
  }

  /** A memo hit whose cache entry was dropped out from under it (an
    * external `clearCache()`) re-registers the cache — but ONLY for keys
    * that passed admission (their budget reservation still stands), and
    * never under `=never`. Recompute is only the scratch-parquet scan,
    * never the original chain. `storageLevel` consults the session's
    * CacheManager, so this is a cheap lookup. */
  private def healed(df: DataFrame, k: (String, String)): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
        && !overridePref.contains(false)
        && (pinnedEst.contains(k) || overridePref.contains(true)))
      df.cache()
    df
  }

  /** Per-key serialization: Verify runs queries 4-wide and racing
    * builders must not overwrite the same scratch path concurrently
    * (unlike the old racy-but-benign double `cache()`). */
  private def memo(k: (String, String), build: => DataFrame): DataFrame = {
    val lock = locks.computeIfAbsent(k, _ => new Object)
    lock.synchronized {
      healed(frames.getOrElseUpdate(k, materialize(build, k)), k)
    }
  }

  /** `build` is evaluated on every call (needed to learn the owning
    * session) but the materialized frame wins on a hit — fine for lazy
    * plan builders. For builders that run jobs eagerly use [[of]]. */
  def apply(key: String)(build: => DataFrame): DataFrame = {
    val df = build
    memo((token(df.sparkSession), key), df)
  }

  /** Session-explicit variant that does NOT evaluate `build` on a hit —
    * required when the builder runs Spark jobs eagerly (e.g. iterative
    * algorithms), where re-evaluating just to discard would redo the
    * work. */
  def of(spark: org.apache.spark.sql.SparkSession, key: String)
        (build: => DataFrame): DataFrame =
    memo((token(spark), key), build)
}
