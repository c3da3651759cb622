package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series primitive Spark has no native
  * operator for (DuckDB: `ASOF JOIN`, kdb: `aj`): for every left row,
  * attach the single right row with the greatest `rightTs <= leftTs`
  * sharing the key columns; left rows with no earlier right row keep NULL
  * payload (left-join semantics).
  *
  * Implementation is the scalable union + ordered-window shape, NOT a
  * range join: both sides shuffle ONCE on the key, rows interleave in
  * time order, and each left row picks the last right row seen via
  * `last(_, ignoreNulls = true)` over the per-key timeline. A range join
  * (`l.ts >= r.ts` + dedupe) explodes to |L|×|R| pairs per key before
  * pruning — this stays O(|L|+|R|) through the shuffle. A right row AT
  * exactly `leftTs` is visible to that left row (ties sort right-first),
  * matching DuckDB's `ON l.ts >= r.ts` semantics.
  *
  * The payload travels as ONE struct column, so all payload values come
  * from the SAME right row and a legitimately-NULL field inside the
  * matched row is preserved (per-column `last(ignoreNulls)` would skip it
  * and leak an older row's value — and could mix columns from different
  * rows). NULL join keys never match (equality semantics, like DuckDB
  * ASOF): NULL-keyed right rows are dropped before the union, so
  * NULL-keyed left rows keep NULL payload. */
object AsofJoin {

  /** Greatest `rightTs <= leftTs` per key (DuckDB `ON l.ts >= r.ts`). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    joinAsof(left, right, keys, leftTs, rightTs, payload, fwd = false)

  /** Mirror image: smallest `rightTs >= leftTs` per key (DuckDB
    * `ON l.ts <= r.ts`) — "next version at or after". Same union +
    * one-shuffle-per-side window shape, scanned in descending time order
    * so "last right row seen" is the nearest one ahead. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    joinAsof(left, right, keys, leftTs, rightTs, payload, fwd = true)

  /** Nearest-in-time as-of: whichever of the backward and forward
    * matches is closer to `leftTs`; exact ties prefer the backward
    * (earlier) row — the variant for aligning two sensor streams where
    * "latest reading" is wrong half the time. Composed from the two
    * one-shuffle passes (the right-row timestamp rides along in the
    * payload struct), so the cost is two as-of joins, still never a
    * range-join explosion. Timestamps must be numeric (epoch
    * micros/nanos) so distances compare as plain integers; the chosen
    * right timestamp is surfaced as `matched_ts`. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val p2 = (payload :+ rightTs).distinct
    val b = backward(left, right, keys, leftTs, rightTs, p2)
    val bRen = p2.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"_b_$c"))
    val f = forward(bRen, right, keys, leftTs, rightTs, p2)
    val useB = col(s"_b_$rightTs").isNotNull && (col(rightTs).isNull ||
      (col(leftTs) - col(s"_b_$rightTs")) <= (col(rightTs) - col(leftTs)))
    val chosen = payload.foldLeft(f)((df, c) =>
      df.withColumn(c, when(useB, col(s"_b_$c")).otherwise(col(c))))
      .withColumn("matched_ts",
        when(useB, col(s"_b_$rightTs")).otherwise(col(rightTs)))
    chosen.drop(p2.map(c => s"_b_$c"): _*)
      .drop((if (payload.contains(rightTs)) Seq.empty[String]
             else Seq(rightTs)): _*)
  }

  /** [[backward]] bounded by a maximum gap (pandas `merge_asof`
    * `tolerance`, public semantics): a match farther than `tolerance`
    * behind the left timestamp is discarded — the payload reverts to
    * NULL, preserving left-join row counts. Timestamps must be numeric
    * (epoch days/seconds/micros), like [[nearest]], so the gap compares
    * as a plain integer. Same one-shuffle union+window plan: the bound
    * is a narrow post-projection, not a join-shape change. */
  def backwardTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String, payload: Seq[String],
                        tolerance: Long): DataFrame =
    bounded(left, right, keys, leftTs, rightTs, payload, tolerance, fwd = false)

  /** [[forward]] bounded by a maximum gap ahead (see
    * [[backwardTolerance]]). */
  def forwardTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String, payload: Seq[String],
                       tolerance: Long): DataFrame =
    bounded(left, right, keys, leftTs, rightTs, payload, tolerance, fwd = true)

  private def bounded(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String, payload: Seq[String],
                      tolerance: Long, fwd: Boolean): DataFrame = {
    val p2 = (payload :+ rightTs).distinct
    val j = joinAsof(left, right, keys, leftTs, rightTs, p2, fwd)
    val gap = if (fwd) col(rightTs) - col(leftTs) else col(leftTs) - col(rightTs)
    // materialize the verdict BEFORE clearing: when the caller asked for
    // rightTs itself as payload, clearing it first must not blind the
    // gap check for the remaining columns
    val j2 = j.withColumn("_asof_ok", col(rightTs).isNotNull && gap <= tolerance)
    val cleared = payload.foldLeft(j2)((df, c) =>
      df.withColumn(c, when(col("_asof_ok"), col(c))))
    (if (payload.contains(rightTs)) cleared else cleared.drop(rightTs))
      .drop("_asof_ok")
  }

  private def joinAsof(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String, payload: Seq[String],
                       fwd: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payType = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(payType).as("_pay"): _*)
    val rTagged = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_pay"): _*)
    // ties sort right(0)-first in both directions, so a right row AT the
    // left timestamp is always visible (inclusive bound). `_pay` as the
    // final sort key makes the pick DETERMINISTIC when several right rows
    // share (key, ts): the maximum payload struct wins, instead of
    // whichever row the shuffle happened to order last. Left rows all
    // carry NULL `_pay` and sort after every right row at their ts
    // (`_side` dominates), so their frames see exactly the right rows at
    // or before their timestamp regardless of how the left ties order.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (fwd) col("_ts").desc else col("_ts").asc, col("_side"),
        col("_pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    payload.foldLeft(filled)((df, p) => df.withColumn(p, col("_pay")(p)))
      .drop("_ts", "_side", "_pay")
  }
}
