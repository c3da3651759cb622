package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnels: for a stage list (s₀, s₁, …, sₙ), each
  * user's completion time of stage k is the FIRST sₖ event strictly
  * after that user's stage-(k−1) completion — the semantics where a
  * click logged before the first view is not a conversion, which a
  * naive per-type `min` overcounts.
  *
  * Shape: one user-census aggregation per stage, chained by joins on the
  * user key. Each aggregation is map-side combined and each join key is
  * the user census (one row per user), so the whole funnel is k passes
  * over the event set with no growth anywhere — at 100 TB the event
  * scans dominate and nothing is quadratic. Timestamps are compared, not
  * computed with, so any totally ordered column type works (epoch longs
  * included) and results are engine-exact.
  */
object Funnel {

  /** Per-user stage completion times: one row per user, one
    * `t_<stage>` column per stage (NULL = stage not reached).
    *
    * @param maxGap optional conversion window in the timestamp column's
    *               own units: stage k only counts within `maxGap` of the
    *               stage-(k−1) completion ("a purchase a month after the
    *               click is not that click's conversion"). None = ever.
    */
  def stageTimes(ev: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String],
                 maxGap: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct == stages, "stage names must be unique")
    val first = ev.groupBy(userCol).agg(
      min(when(col(typeCol) === stages.head, col(tsCol))).as(s"t_${stages.head}"))
    stages.zip(stages.drop(1)).foldLeft(first) { case (acc, (prev, st)) =>
      val carried = acc.columns.filterNot(_ == userCol)
      val inWindow = maxGap.map(g => col(tsCol) <= col(s"t_$prev") + g)
        .getOrElse(lit(true))
      ev.join(acc, Seq(userCol))
        .groupBy(userCol, carried: _*)
        .agg(min(when(col(typeCol) === st && col(tsCol) > col(s"t_$prev")
          && inWindow, col(tsCol))).as(s"t_$st"))
    }
  }

  /** One-row funnel summary: user count plus per-stage completion
    * counts (`n_<stage>`), from [[stageTimes]] output. */
  def summary(times: DataFrame, stages: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_users") +:
      stages.map(st => count(col(s"t_$st")).as(s"n_$st"))
    times.agg(aggs.head, aggs.tail: _*)
  }
}
