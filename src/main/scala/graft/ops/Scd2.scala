package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension assembly from a change log — the
  * dimension-history primitive the reference's SCD1 upsert
  * (`usp_upsert_dim*.sql`, insert-new-members-only) does not cover: one
  * row per VERSION with `[effective_from, effective_to)` validity and an
  * `is_current` flag, consecutive no-change rows collapsed.
  *
  * Plan shape: both windows (change detection via `lag`, validity via
  * `lead`) share the same `partitionBy(keys) orderBy(seq)` spec, so the
  * whole op is ONE shuffle on the key and one sort — no self-join, no
  * driver state. `seqCols` must totally order each key's rows (e.g.
  * event time + a unique id) or lag/lead are nondeterministic.
  *
  * NULL attribute values are legitimate versions: change detection uses
  * null-safe equality, so NULL→'a'→NULL yields three versions. */
object Scd2 {

  def fromChangeLog(log: DataFrame, keys: Seq[String], seqCols: Seq[String],
                    tracked: Seq[String], tsCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(seqCols.map(col): _*)
    val changed = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    log
      .withColumn("_rn", row_number().over(w))
      .withColumn("_chg", changed)
      .filter(col("_rn") === 1 || col("_chg"))
      // lead over the FILTERED frame: validity runs to the next VERSION
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("_rn", "_chg")
  }
}
