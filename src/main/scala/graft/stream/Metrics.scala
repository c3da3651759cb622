package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ops telemetry for the streaming lane: a `StreamingQueryListener`
  * that appends one row per completed microbatch — query name, batch
  * id, input rows, processing duration, input/processing rates — to a
  * parquet metrics dir. The runtime counterpart of the batch
  * [[graft.ops.RunLog]]: `run_purge`-style retention, freshness panels
  * and the drift monitor all read the same table.
  *
  * Scale note: progress events are driver-side and tiny (one row per
  * batch), so an append per event is fine at any data scale; a
  * deployment with MANY queries per driver would batch them or forward
  * to a metrics bus instead — the listener seam is the same either way.
  */
final class BatchMetricsListener(spark: SparkSession, dir: String)
    extends StreamingQueryListener {

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val durationMs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(-1L)
    import spark.implicits._
    Seq((name, p.batchId, p.numInputRows, durationMs,
        p.inputRowsPerSecond, p.processedRowsPerSecond, p.timestamp))
      .toDF("query_name", "batch_id", "input_rows", "duration_ms",
        "input_rps", "processed_rps", "progress_ts")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object Metrics {
  /** Register a metrics listener writing to `dir`; returns it so the
    * caller can `spark.streams.removeListener` when done. */
  def attach(spark: SparkSession, dir: String): BatchMetricsListener = {
    val l = new BatchMetricsListener(spark, dir)
    spark.streams.addListener(l)
    l
  }
}
