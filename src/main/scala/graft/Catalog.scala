package graft

import org.apache.spark.sql.SparkSession

import graft.batch.StarModel
import graft.model.{EventsModel, TaxiModel}

/** SQL surface: registers the engine's logical datasets (SURVEY §1.3) as
  * temp views so users can drive everything through `spark.sql(...)` —
  * the interface the reference's users already have. Views are lazy
  * plans over the fixture lake; Catalyst optimizes through them
  * (pushdown/pruning reach the parquet scans). */
object Catalog {

  /** View names registered by [[registerAll]]. */
  val views: Seq[String] = Seq(
    "raw_trips", "stg_trip", "core_trip_clean", "err_trip",
    "dim_vendor", "dim_payment", "dim_rate", "dim_flag", "dim_location",
    "fact_trip", "vw_fact_trip_bi",
    "stream_events", "stream_routed",
    "documents", "embeddings")

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._

    val trips = TaxiModel.trips(spark, sfDir)
    trips.createOrReplaceTempView("raw_trips")
    val stg = TaxiModel.tripsWithDups(spark, sfDir)
    stg.createOrReplaceTempView("stg_trip")
    val deduped = TaxiModel.deduped(
      TaxiModel.cleaned(stg, TaxiModel.paymentTypeMap(spark)))
    deduped.createOrReplaceTempView("core_trip_clean")
    stg.filter(!TaxiModel.domainFilter)
      .withColumn("reject_reason", TaxiModel.rejectReason)
      .createOrReplaceTempView("err_trip")

    val dv = StarModel.dim(deduped, "vendor_code", "vendor_nk", "vendor_sk")
    val dp = StarModel.dim(deduped, "payment_type", "payment_nk", "payment_sk")
    val dr = StarModel.dim(deduped, "rate_code", "rate_nk", "rate_sk")
    val df = StarModel.dim(deduped, "flag_raw", "flag_nk", "flag_sk")
    val dl = StarModel.dimLocation(deduped)
    dv.createOrReplaceTempView("dim_vendor")
    dp.createOrReplaceTempView("dim_payment")
    dr.createOrReplaceTempView("dim_rate")
    df.createOrReplaceTempView("dim_flag")
    dl.createOrReplaceTempView("dim_location")
    val fact = StarModel.fact(deduped, dv, dp, dr, df, dl)
    fact.createOrReplaceTempView("fact_trip")

    // BI flatten (ref: vw_fact_trip_bi.view.sql): star join + derived KPIs
    fact.join(broadcast(dv), Seq("vendor_sk"), "left")
      .join(broadcast(dp), Seq("payment_sk"), "left")
      .withColumn("tip_pct", when(col("fare_amount") > 0,
        col("tip_amount") / col("fare_amount")))
      .withColumn("fare_per_km", when(col("trip_distance_km") > 0,
        col("fare_amount") / col("trip_distance_km")))
      .createOrReplaceTempView("vw_fact_trip_bi")

    Tables(spark, sfDir, "events").createOrReplaceTempView("stream_events")
    EventsModel.routed(spark, sfDir).createOrReplaceTempView("stream_routed")
    Tables(spark, sfDir, "documents").createOrReplaceTempView("documents")
    Tables(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
  }
}
