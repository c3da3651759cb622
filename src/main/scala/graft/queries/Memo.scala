package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Session-scoped materialization of shared intermediates.
  *
  * The reference materializes `core.trip_clean` / `mdl.fact_trip` once per
  * run and every downstream statement reads the table; the declared
  * queries are independent programs over the same fixtures, so without
  * this each would rebuild the whole chain. `cache()` is the in-session
  * analog of those materialized tables (at 100 TB: a persisted Parquet/
  * Delta table written once per slice, exactly as [[graft.batch.Runner]]
  * does).
  *
  * Entries are keyed by the owning SparkSession's identity as well, so a
  * harness that rebuilds its session never sees a frame bound to a
  * stopped one. */
object Memo {
  private val frames = TrieMap.empty[(Int, String), DataFrame]

  /** A memo hit whose cache entry was dropped out from under it (an
    * external `clearCache()`, memory-pressure eviction of the ENTRY —
    * not just blocks — by a harness) would silently rebuild its chain on
    * every downstream query; re-register instead. `storageLevel`
    * consults the session's CacheManager, so this is a cheap lookup. */
  private def healed(df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.cache()
    df
  }

  /** `build` is evaluated on every call (needed to learn the owning
    * session) but the CACHED frame wins on a hit — fine for lazy plan
    * builders. For builders that run jobs eagerly use [[of]]. */
  def apply(key: String)(build: => DataFrame): DataFrame = {
    val df = build
    val sessionId = System.identityHashCode(df.sparkSession)
    healed(frames.getOrElseUpdate((sessionId, key), df.cache()))
  }

  /** Session-explicit variant that does NOT evaluate `build` on a hit —
    * required when the builder runs Spark jobs eagerly (e.g. iterative
    * algorithms), where re-evaluating just to discard would redo the
    * work. */
  def of(spark: org.apache.spark.sql.SparkSession, key: String)
        (build: => DataFrame): DataFrame =
    healed(frames.getOrElseUpdate(
      (System.identityHashCode(spark), key), build.cache()))
}
