package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the stream-slice chain. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name rows=$n")
    }
    time("raw events")(graft.model.EventsModel.rawEvents(spark, sfDir).count())
    time("envelopes")(graft.model.EventsModel.envelopes(spark, sfDir).count())
    time("parsed")(graft.model.EventsModel.parsed(spark, sfDir).count())
    time("enriched")(graft.stream.StreamTransforms.enrich(
      graft.model.EventsModel.parsed(spark, sfDir)).count())
    time("routed")(graft.model.EventsModel.routed(spark, sfDir).count())
    val routed = graft.model.EventsModel.routed(spark, sfDir)
    time("slice no-window")(routed.filter(col("sink") === "curated")
      .withColumn("trip_id", graft.stream.StreamTransforms.streamTripId).count())
    time("full slice")(graft.stream.StreamTransforms
      .buildSlice(routed, lit("r")).count())
    time("full slice again")(graft.stream.StreamTransforms
      .buildSlice(graft.model.EventsModel.routed(spark, sfDir), lit("r")).count())
    spark.stop()
  }
}
// appended dev probe for the batch lane
object ProfileBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name rows=$n")
    }
    time("lineitem")(Tables(spark, sfDir, "lineitem").count())
    time("lineitem again")(Tables(spark, sfDir, "lineitem").count())
    time("trips")(graft.model.TaxiModel.trips(spark, sfDir).count())
    time("trips again")(graft.model.TaxiModel.trips(spark, sfDir).count())
    val t = graft.model.TaxiModel.trips(spark, sfDir)
    time("trips filter")(t.filter(org.apache.spark.sql.functions.col("fare_amount") >= 0).count())
    time("cleaned")(graft.model.TaxiModel.cleaned(
      graft.model.TaxiModel.tripsWithDups(spark, sfDir),
      graft.model.TaxiModel.paymentTypeMap(spark)).count())
    time("deduped")(graft.model.TaxiModel.deduped(graft.model.TaxiModel.cleaned(
      graft.model.TaxiModel.tripsWithDups(spark, sfDir),
      graft.model.TaxiModel.paymentTypeMap(spark))).count())
    spark.stop()
  }
}
