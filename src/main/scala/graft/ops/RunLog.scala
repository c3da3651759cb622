package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.SparkSession

/** Ops/audit surface (SURVEY.md §2.9): append-only run log + DQ results +
  * run metrics, the Spark analog of `ops.run_log` / `ops.dq_result` /
  * `ops.run_metrics` (stg_logrun.sql:7-19, 300_stg_dq.json,
  * 30_run_metrics.table.sql). */
final case class RunLog(spark: SparkSession, dir: String) {
  import spark.implicits._

  val runLogSchema: StructType = StructType.fromDDL(
    "run_id STRING, stage STRING, status STRING, rows_in BIGINT, " +
      "rows_out BIGINT, rows_err BIGINT, message STRING, logged_at TIMESTAMP_NTZ")
  val dqSchema: StructType = StructType.fromDDL(
    "run_id STRING, stage STRING, check_name STRING, status STRING, " +
      "observed BIGINT, logged_at TIMESTAMP_NTZ")
  val metricsSchema: StructType = StructType.fromDDL(
    "run_id STRING, slice STRING, rows_in BIGINT, rows_out BIGINT, rows_err BIGINT, " +
      "logged_at TIMESTAMP_NTZ")

  val runLog: ParquetTable = ParquetTable(spark, s"$dir/ops_run_log", runLogSchema)
  val dqResult: ParquetTable = ParquetTable(spark, s"$dir/ops_dq_result", dqSchema)
  val runMetrics: ParquetTable = ParquetTable(spark, s"$dir/ops_run_metrics", metricsSchema)

  def logRun(runId: String, stage: String, status: String, rowsIn: Long = 0,
             rowsOut: Long = 0, rowsErr: Long = 0, message: String = ""): Unit =
    runLog.append(Seq((runId, stage, status, rowsIn, rowsOut, rowsErr, message))
      .toDF("run_id", "stage", "status", "rows_in", "rows_out", "rows_err", "message")
      .withColumn("logged_at", current_timestamp().cast("timestamp_ntz")))

  def logDq(runId: String, stage: String, results: Seq[(String, String, Long)]): Unit =
    dqResult.append(results.toDF("check_name", "status", "observed")
      .withColumn("run_id", lit(runId)).withColumn("stage", lit(stage))
      .withColumn("logged_at", current_timestamp().cast("timestamp_ntz")))

  def logMetrics(runId: String, slice: String, rowsIn: Long, rowsOut: Long,
                 rowsErr: Long): Unit =
    runMetrics.append(Seq((runId, slice, rowsIn, rowsOut, rowsErr))
      .toDF("run_id", "slice", "rows_in", "rows_out", "rows_err")
      .withColumn("logged_at", current_timestamp().cast("timestamp_ntz")))
}
