package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantile estimate — the DETERMINISTIC mergeable
  * quantile sketch (the role t-digest/KLL play, in a form a DuckDB oracle
  * can check bit-for-bit, the same trade [[graft.functions.KmvDistinct]]
  * makes vs HLL): per group, `bins` counters over a declared [lo, hi)
  * domain; the q-quantile is read off the cumulative histogram with
  * linear interpolation inside the owning bin. Estimation error is
  * bounded by one bin width — by construction, not probabilistically.
  *
  * Scale shape: the sketch state is O(bins) counters per group,
  * map-side combined (a groupBy on (group, bin) — no per-group sort, no
  * full-value shuffle, which is what the exact `percentile` aggregate
  * needs and why it can't stream or merge); the assembly window runs
  * over ≤ bins rows per group. Out-of-domain values clamp into the edge
  * bins (they still count — the estimate degrades only at the edges).
  */
object QuantileSketch {

  /** @return one row per group: group cols, n, est (the interpolated
    *         q-quantile estimate) */
  def estimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
               lo: Double, hi: Double, bins: Int, q: Double): DataFrame = {
    require(bins > 0 && hi > lo && q > 0 && q < 1,
      "need bins > 0, hi > lo, 0 < q < 1")
    val w = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lo) / w).cast("int")))
    val counts = df.groupBy(groupCols.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("c"))
    val ordered = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val whole = Window.partitionBy(groupCols.map(col): _*)
    val target = lit(q) * col("n")
    counts
      .withColumn("cum", sum(col("c")).over(ordered))
      .withColumn("n", sum(col("c")).over(whole))
      .filter(col("cum") >= target)
      .withColumn("_rn", row_number().over(ordered))
      .filter(col("_rn") === 1)
      .select(groupCols.map(col) :+ col("n") :+
        // every term is dyadic (integer counts, q*n, one IEEE divide) —
        // identical bits in any IEEE-754 engine, so NO rounding; rounding a
        // double to 12 decimals is the cross-engine divergence mechanism
        // (WindowedStats.windowedQuantile is unrounded identically so the
        // streaming==batch==sketch spec equality survives)
        (lit(lo) + lit(w) * col("bin") +
          lit(w) * (target - (col("cum") - col("c"))) / col("c")).as("est"): _*)
  }
}
