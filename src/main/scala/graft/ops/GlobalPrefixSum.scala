package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running total in sort order without a single-task window — the
  * prefix-sum sibling of [[GlobalRowNumber]], and the primitive behind
  * token-budget shard packing (`corpus_pack`).
  *
  * Shape: range-repartition on the sort key, per-partition value sums
  * (tiny: one row per partition) become cumulative offsets on the
  * driver, then a PARTITION-LOCAL cumulative window adds the offset.
  * Every stage is parallel — the local window re-clusters by the
  * partition id (one hash exchange), never into one task.
  *
  * `sortCols` must totally order the rows; the ranged frame is cached so
  * the offset pass and the output pass see one RangePartitioner sample
  * (see [[GlobalRowNumber]]). The value column must be integral —
  * long-exact sums make the result independent of evaluation order. */
object GlobalPrefixSum {

  def withRunningTotal(df: DataFrame, valueCol: String, outCol: String,
                       sortCols: Seq[String], numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = sortCols.map(col)
    val ranged = df.repartitionByRange(parts, cols: _*)
      .withColumn("_gpid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = ranged.groupBy("_gpid")
      .agg(sum(col(valueCol).cast("long")).as("_s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + sums.getOrElse(p, 0L))
    // O(1) array lookup, not an O(parts)-deep CaseWhen (see GlobalRowNumber)
    val offsetOf = element_at(typedLit(offsets.take(parts)), col("_gpid") + 1)
    val w = Window.partitionBy(col("_gpid")).orderBy(cols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Eager output materialization + unpersist: same hygiene rationale as
    // GlobalRowNumber — the cache must cover both passes, but must not
    // outlive the op.
    val out = ranged
      .withColumn(outCol, offsetOf + sum(col(valueCol).cast("long")).over(w))
      .drop("_gpid")
      .localCheckpoint(true)
    ranged.unpersist(false)
    out
  }
}
