package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}

/** A minimal dir-backed managed table (no Delta in this environment —
  * SURVEY §7.4 hard-part 3): plain Parquet with append / overwrite /
  * delete-where / partition-scoped merge primitives.
  *
  * `partitionCols` (optional, single level is all the engine needs) makes
  * the table hive-partitioned: appends and overwrites lay out
  * `col=value/` dirs, [[overwritePartitions]] is a *dynamic* partition
  * overwrite (only the partitions present in the incoming frame are
  * replaced — the O(slice) merge commit the hourly lane needs at 100 TB),
  * and [[dropPartitions]] deletes whole partition dirs without a rewrite
  * (retention purge). At 100 TB the same call sites swap to Delta/Iceberg
  * `MERGE`/`DELETE`; the engine's semantics (idempotent keys, run-scoped
  * slices) don't change.
  *
  * Full-table [[overwrite]] is crash-safe: the staged dir is written
  * first, the live dir is renamed aside to `dir._bak`, the staged dir is
  * renamed in, and the backup is deleted last. A crash between the two
  * renames leaves `._bak` in place and [[read]] restores it — the table
  * never silently reads as empty after it has been written once.
  */
final case class ParquetTable(spark: SparkSession, dir: String, schema: StructType,
                              partitionCols: Seq[String] = Nil)
  extends PartitionedTableOps {

  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val bakPath = new Path(dir + "._bak")

  def exists: Boolean = fs.exists(new Path(dir))

  def read: DataFrame = {
    if (!exists && fs.exists(bakPath)) fs.rename(bakPath, new Path(dir)) // crash recovery
    if (exists) spark.read.schema(schema).parquet(dir)
      .select(schema.fieldNames.map(col).toSeq: _*)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  private def writer(df: DataFrame, mode: SaveMode) = {
    val w = df.select(schema.fieldNames.map(col).toSeq: _*).write.mode(mode)
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }

  def append(df: DataFrame): Unit = writer(df, SaveMode.Append).parquet(dir)

  /** Full-table rebuild via staged dir + backup-aside rename (see class
    * doc). Only correct use at scale: tiny tables (dims) and test rigs. */
  def overwrite(df: DataFrame): Unit = {
    val tmp = new Path(dir + "._staged")
    writer(df, SaveMode.Overwrite).parquet(tmp.toString)
    val target = new Path(dir)
    if (fs.exists(bakPath)) fs.delete(bakPath, true) // stale backup from a crash-after-swap
    if (fs.exists(target)) fs.rename(target, bakPath)
    fs.rename(tmp, target)
    fs.delete(bakPath, true)
  }

  /** Dynamic partition overwrite: replaces ONLY the partitions present in
    * `df`, leaves every other partition's files untouched on disk. This is
    * the O(touched-slice) commit for the hourly merge — the whole-table
    * rename dance above is never paid. */
  def overwritePartitions(df: DataFrame): Unit = {
    require(partitionCols.nonEmpty, s"$dir is not partitioned")
    writer(df, SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)
  }

  /** [[overwritePartitions]] with the input STAGED to a sibling temp dir
    * first: `df` is materialized to `dir._staged_merge`, read back, and the
    * dynamic overwrite runs from those files. Use when `df`'s plan READS
    * this table (merge/rewrite-in-place shapes): without staging, the
    * overwrite job's tasks can re-read partition files the commit is
    * concurrently deleting if a cached block is lost mid-write (executor
    * loss in cluster mode) — silent data loss. The extra cost is one
    * write+read of the touched slice, O(slice) not O(table). */
  def overwritePartitionsStaged(df: DataFrame): Unit = {
    require(partitionCols.nonEmpty, s"$dir is not partitioned")
    val tmp = new Path(dir + "._staged_merge")
    if (fs.exists(tmp)) fs.delete(tmp, true) // orphan from a prior crash
    df.select(schema.fieldNames.map(col).toSeq: _*)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    overwritePartitions(spark.read.schema(schema).parquet(tmp.toString))
    fs.delete(tmp, true)
  }

  /** First-level Hive-style partition directories currently on disk, as
    * (rawDirValue, path) — `__HIVE_DEFAULT_PARTITION__` is the null slot.
    * For multi-level tables these are the `partitionCols.head=` dirs (the
    * granularity retention purges operate on). */
  def partitions: Seq[(String, Path)] = {
    require(partitionCols.nonEmpty, s"$dir is not partitioned")
    if (!exists) Seq.empty
    else fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCols.head + "="))
      .map(s => (s.getPath.getName.stripPrefix(partitionCols.head + "="), s.getPath))
  }

  /** Partitions `drop` selects — the exact set a [[dropPartitions]] call
    * with the same predicate deletes — as (rawDirValue, path). */
  private def selectPartitions(drop: Option[String] => Boolean): Seq[(String, Path)] =
    partitions.filter { case (v, _) =>
      val decoded = HivePaths.unescape(v)
      drop(if (decoded == "__HIVE_DEFAULT_PARTITION__") None else Some(decoded))
    }

  /** Rows inside the partitions `drop` selects — the rows a
    * [[dropPartitions]] call with the same predicate removes. Shares the
    * selection with the drop, so count and delete can never disagree on
    * which partitions qualify (a Spark-castable but non-ISO value counts
    * for neither). Parquet-footer count, no data read. */
  def countPartitions(drop: Option[String] => Boolean): Long =
    countPaths(selectPartitions(drop).map(_._2))

  /** Footer row count of specific partition dirs. The explicit schema
    * (partition column reads as null — irrelevant for counting) keeps an
    * empty dir from throwing schema inference errors where the drop
    * itself would succeed. */
  private def countPaths(paths: Seq[Path]): Long =
    if (paths.isEmpty) 0L
    else spark.read.schema(schema).parquet(paths.map(_.toString): _*).count()

  /** Count-then-drop over ONE directory listing: the returned rows count
    * is exactly the rows removed even if a concurrent writer creates or
    * fills qualifying partitions between the two steps. Returns
    * (rowsDeleted, dropped raw partition values). */
  def purgePartitions(drop: Option[String] => Boolean): (Long, Seq[String]) = {
    val selected = selectPartitions(drop)
    val rows = countPaths(selected.map(_._2))
    selected.foreach { case (_, p) => fs.delete(p, true) }
    (rows, selected.map(_._1))
  }

  /** Drop whole first-level partitions (metadata-only delete, no rewrite):
    * removes every partition dir whose *decoded string value* satisfies
    * `drop == true`. Null partitions (`__HIVE_DEFAULT_PARTITION__`) are
    * passed to the predicate as None. Returns the dropped partition
    * values. */
  def dropPartitions(drop: Option[String] => Boolean): Seq[String] = {
    val dropped = selectPartitions(drop)
    dropped.foreach { case (_, p) => fs.delete(p, true) }
    dropped.map(_._1)
  }

  /** DELETE WHERE cond (rewrite; null-valued conditions keep the row,
    * matching SQL DELETE semantics). */
  def deleteWhere(cond: Column): Unit =
    if (exists) overwrite(read.filter(not(coalesce(cond, lit(false)))))
}
