package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute warm-chain cost stage by stage (no Memo layer, so
  * each timing is the raw chain segment, not scratch-parquet IO).
  *
  * Round-9 findings at sf0.1 (idle machine, local[32]): every stage's
  * wall time is dominated by FIXED per-query cost — whole-stage-codegen
  * compile + job scheduling, 1–4 s per distinct plan shape, with ±2 s
  * run-to-run variance on identical plans — while the actual per-row
  * work (to_json → from_json → enrich → sha256 id → dedupe agg on 100 k
  * events) is sub-second once compiled. `StreamQueries.warm` lands at
  * ~6–13 s idle, all of it compile + Memo scratch IO; the official r8
  * 111.7 s reading was external machine load on those same fixed costs.
  * At scale the fixed costs amortize to zero; the chain itself is one
  * narrow pipeline + one dedupe shuffle. */
object WarmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name rows=$n")
    }
    t("events.scan")(Tables(spark, sfDir, "events").count())
    t("events.envelopes.forced")(graft.model.EventsModel.envelopes(spark, sfDir)
      .select(max(length(col("json")))).count())
    t("events.parsed.forced")(graft.model.EventsModel.parsed(spark, sfDir)
      .select(max(col("event_id")), max(col("pickup_ts")), max(col("fare_amount")))
      .count())
    val routedDf = graft.model.EventsModel.routed(spark, sfDir)
    t("events.routed.forced")(routedDf
      .select(max(col("sink")), max(col("duration_min"))).count())
    t("events.buildSlice")(graft.stream.StreamTransforms.buildSlice(
      routedDf, lit("run-fixed")).count())
    t("StreamQueries.warm") {
      graft.queries.StreamQueries.warm(spark, sfDir); 0L
    }
    t("StreamQueries.warm(2nd)") {
      graft.queries.StreamQueries.warm(spark, sfDir); 0L
    }
    spark.stop()
  }
}
