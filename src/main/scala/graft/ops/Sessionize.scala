package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-level gap sessionization: stamp EVERY event with its per-key
  * session ordinal — the assignment operator sessionized feature
  * pipelines join against. The per-session rollup sibling is
  * `WindowedStats.vendorSessions` (Spark's `session_window`); this op
  * exists because the rollup loses the event→session mapping, and
  * re-deriving it via a range join against session spans costs a second
  * shuffle the window form never pays.
  *
  * A new session starts where the gap to the previous event (same key,
  * time order) exceeds `gap`, or at the key's first event; `session_seq`
  * is the running count of starts, so (key, session_seq) is the session's
  * natural key.
  *
  * Scale shape: the break flag (lag) and the running count (sum) use the
  * SAME window spec, so Catalyst plans one hash-partition exchange on the
  * key + one sort — the second Window reuses the first's output order
  * (no extra exchange; the dependent expressions just can't share a
  * single Window operator). Sessions are per-key by construction, so no
  * global ordering exists anywhere — this scales to any key cardinality,
  * with per-key event counts the only skew axis (same bound as any
  * per-entity window).
  */
object Sessionize {

  /** @param keys      partition keys (the session scope, e.g. user)
    * @param tsCol     numeric/comparable event-time column name
    * @param tiebreak  columns that break equal-timestamp ties (must make
    *                  the per-key order total, or the running count is
    *                  nondeterministic)
    * @param gap       max in-session gap, in `tsCol` units (strictly
    *                  greater starts a new session) */
  def assign(df: DataFrame, keys: Seq[String], tsCol: String,
             tiebreak: Seq[String], gap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tiebreak).map(col): _*)
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("_brk",
        when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("is_session_start", col("_brk") === 1L)
      .drop("_brk")
  }
}
