package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** A minimal dir-backed managed table (no Delta in this environment —
  * SURVEY §7.4 hard-part 3): plain Parquet with append / overwrite /
  * delete-where / merge primitives.
  *
  * Mutations (`deleteWhere`, overwrite-rebuild merges) rewrite via a temp
  * dir + atomic-ish rename, mirroring the reference notebook's tmp-dir +
  * rename commit (nb_convert_parquet_to_snappy cells 3-5). At 100 TB the
  * same call sites swap to Delta/Iceberg `MERGE`/`DELETE`; the engine's
  * semantics (idempotent keys, run-scoped slices) don't change.
  */
final case class ParquetTable(spark: SparkSession, dir: String, schema: StructType) {

  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(dir))

  def read: DataFrame =
    if (exists) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def append(df: DataFrame): Unit =
    df.select(schema.fieldNames.map(col): _*).write.mode(SaveMode.Append).parquet(dir)

  def overwrite(df: DataFrame): Unit = {
    // write to a sibling tmp dir first, then swap — never read+overwrite
    // the same files in one job
    val tmp = dir + "._staged"
    df.select(schema.fieldNames.map(col): _*).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new Path(dir)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(new Path(tmp), target)
  }

  /** DELETE WHERE cond (rewrite). */
  def deleteWhere(cond: Column): Unit = if (exists) overwrite(read.filter(!cond))
}
