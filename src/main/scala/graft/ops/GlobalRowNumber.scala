package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable total-order ROW_NUMBER — what `Window.orderBy` without a
  * partition spec degenerates to a single-task sort for.
  *
  * Shape: range-repartition on the sort key (so partition p holds keys
  * strictly below partition p+1), count rows per partition (tiny: one
  * row per partition, bounded by the cluster's partition count, not the
  * data), turn the counts into cumulative offsets on the driver, then a
  * PARTITION-LOCAL window adds `offset(p) + local row_number`. Every
  * stage is parallel; the only driver traffic is the per-partition count
  * vector.
  *
  * `sortCols` must totally order the rows (a unique composite) — equal
  * keys could otherwise straddle a range boundary and take arbitrary
  * relative numbers.
  *
  * The ranged frame is CACHED before the count pass: RangePartitioner's
  * sample seed derives from the RDD id, so re-executing the shuffle in
  * the numbering pass could draw DIFFERENT boundaries — both passes must
  * read one materialization (on a long-lived cluster job: a persisted
  * table or reliable checkpoint). */
object GlobalRowNumber {

  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Seq[String],
                    numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = sortCols.map(col)
    val ranged = df.repartitionByRange(parts, cols: _*)
      .withColumn("_gpid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = ranged.groupBy("_gpid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetOf = (0 until parts)
      .foldLeft(lit(0L))((acc, p) => when(col("_gpid") === p, offsets(p)).otherwise(acc))
    val w = Window.partitionBy(col("_gpid")).orderBy(cols: _*)
    ranged
      .withColumn(rnCol, (offsetOf + row_number().over(w)).cast("int"))
      .drop("_gpid")
  }
}
