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
  * time order, and each left row picks the last right payload seen via
  * `last(_, ignoreNulls = true)` over the per-key timeline. A range join
  * (`l.ts >= r.ts` + dedupe) explodes to |L|×|R| pairs per key before
  * pruning — this stays O(|L|+|R|) through the shuffle. A right row AT
  * exactly `leftTs` is visible to that left row (ties sort right-first),
  * matching DuckDB's `ON l.ts >= r.ts` semantics. */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val rTagged = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(lTagged.unionByName(rTagged)) { (df, p) =>
        df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
      }
      .filter(col("_side") === 1)
      .drop("_ts", "_side")
  }
}
