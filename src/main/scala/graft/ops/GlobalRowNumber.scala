package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable total-order ROW_NUMBER — what `Window.orderBy` without a
  * partition spec degenerates to a single-task sort for.
  *
  * Shape: range-repartition on the sort key (so partition p holds keys
  * strictly below partition p+1), sort within partitions, then read the
  * (partition id, local row index) pair that `monotonically_increasing_id`
  * encodes (pid in the high 31 bits, a counter in row order below).
  * Per-partition counts (tiny: one row per partition, bounded by the
  * cluster's partition count, not the data) become cumulative offsets on
  * the driver, and `rn = offset(pid) + local + 1` is a pure projection.
  * ONE shuffle total — no window, so no re-clustering exchange on the
  * partition id and no single-task sort anywhere.
  *
  * `sortCols` must totally order the rows (a unique composite) — equal
  * keys could otherwise straddle a range boundary and take arbitrary
  * relative numbers.
  *
  * The ranged frame is CACHED before the count pass: RangePartitioner's
  * sample seed derives from the RDD id, so re-executing the shuffle in
  * the numbering pass could draw DIFFERENT boundaries — both passes must
  * read one materialization (on a long-lived cluster job: a persisted
  * table or reliable checkpoint). Per-partition row counts are capped at
  * 2^33 by the id encoding — 8.5 B rows per partition, far above any
  * sane partition size. */
object GlobalRowNumber {

  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Seq[String],
                    numPartitions: Int = 0): DataFrame =
    withRowNumberExpr(df, rnCol, sortCols.map(col), numPartitions)

  /** Column-expression variant: sort orderings may carry direction
    * (`col("rev").desc`) — `repartitionByRange` and
    * `sortWithinPartitions` both honor SortOrder, so a descending global
    * rank costs the same one shuffle as an ascending one. */
  def withRowNumberExpr(df: DataFrame, rnCol: String, sortExprs: Seq[Column],
                        numPartitions: Int = 0): DataFrame =
    withRowNumberExprCounted(df, rnCol, sortExprs, numPartitions)._1

  /** [[withRowNumberExpr]] plus the TOTAL row count, read off the same
    * per-partition counts the numbering pass already collected — free,
    * and it lets a caller needing `n` (e.g. the arithmetic
    * [[ntileFromRank]]) embed it as a LITERAL instead of paying a
    * count scan + 1-row broadcast join. */
  def withRowNumberExprCounted(df: DataFrame, rnCol: String, sortExprs: Seq[Column],
                               numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = sortExprs
    val ranged = df.repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("_mid"), 33)
    val local = col("_mid").bitwiseAND((1L << 33) - 1)
    val counts = ranged.groupBy(pid.as("_pid")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p.toLong, 0L))
    // O(1) array lookup, not an O(parts)-deep CaseWhen: at production
    // shuffle-partition counts (thousands) a nested when() tree risks
    // codegen method-size limits and deep Catalyst transforms
    val offsetOf = element_at(typedLit(offsets.take(parts)), (pid + 1).cast("int"))
    // Eagerly materialize the numbered output (lineage cut, blocks are
    // ContextCleaner-managed), then release the ranged cache — returning a
    // lazy frame over `ranged` would pin it in the cache manager forever,
    // and unpersisting earlier would let the output pass redraw
    // RangePartitioner boundaries (see the cache note above).
    val out = ranged
      .withColumn(rnCol, offsetOf + local + 1) // LONG: > 2^31 rows must not wrap
      .drop("_mid")
      .localCheckpoint(true)
    ranged.unpersist(false)
    (out, offsets.last)
  }

  /** SQL `NTILE(k)` bucket computed arithmetically from a 1-based global
    * rank and the total row count — the companion to [[withRowNumberExpr]]
    * that lets a query keep standard ntile semantics without a
    * partition-less window: with base = ⌊n/k⌋ and r = n mod k, the first
    * r buckets hold base+1 rows and the rest hold base (exactly what the
    * window function assigns over the same total order). Integer-exact
    * below 2^53 rows (the divisions go through IEEE doubles). */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val base = floor(n / lit(k)).cast("long")
    val r = pmod(n, lit(k))
    val head = r * (base + lit(1)) // rows covered by the r fat buckets
    when(rank <= head, floor((rank - 1) / (base + lit(1))) + lit(1))
      .otherwise(r + floor((rank - head - 1) / base) + lit(1))
      .cast("int")
  }
}
