package graft

import org.apache.spark.sql.streaming.Trigger

/** The per-microbatch ops telemetry listener. */
class StreamMetricsSpec extends SparkSpec {

  import spark.implicits._

  test("listener appends one metrics row per completed microbatch") {
    val in = tmpDir("graft_metrics_in")
    val out = tmpDir("graft_metrics_out")
    Seq("a", "b", "c").toDF("v").write.mode("overwrite").parquet(in)
    val l = graft.stream.Metrics.attach(spark, out)
    try {
      val q = spark.readStream.schema("v STRING").parquet(in)
        .writeStream.format("memory").queryName("metrics_probe")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "probe stream finished in time")
      assert(q.exception.isEmpty, s"probe stream clean: ${q.exception}")
      // progress events are delivered asynchronously — poll for the row
      val deadline = System.currentTimeMillis + 30000
      var rows = Seq.empty[org.apache.spark.sql.Row]
      while (rows.isEmpty && System.currentTimeMillis < deadline) {
        Thread.sleep(250)
        rows =
          try spark.read.parquet(out)
            .filter($"query_name" === "metrics_probe").collect().toSeq
          catch { case _: Throwable => Seq.empty } // dir not written yet
      }
      assert(rows.nonEmpty, "a metrics row was recorded")
      assert(rows.head.getAs[Long]("input_rows") == 3L,
        s"row counts the batch input: ${rows.head}")
      assert(rows.head.getAs[Long]("duration_ms") >= 0L)
    } finally spark.streams.removeListener(l)
  }
}
