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
    "dim_date", "dim_time",
    "fact_trip", "vw_fact_trip_bi",
    "stream_events", "stream_routed",
    "documents", "embeddings", "vw_doc_quality", "vw_doc_dedup",
    "vw_doc_splits", "vw_corpus_stats") ++
    // raw fixture tables, verbatim — the general-OLAP star schema
    // (olap_* shapes run on these) for users who start from plain SQL
    Tables.names.filterNot(Set("documents", "embeddings"))

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
    val dd = StarModel.dimDate(deduped)
    val dt = StarModel.dimTime(spark)
    dd.createOrReplaceTempView("dim_date")
    dt.createOrReplaceTempView("dim_time")
    val fact = StarModel.fact(deduped, dv, dp, dr, df, dl)
    fact.createOrReplaceTempView("fact_trip")

    // Full BI flatten (ref: vw_fact_trip_bi.view.sql:41-48): dim_date is
    // the view's FIRST (inner) join, then dim_time and the conformed dims,
    // with dim_location role-played twice — 8 joins, all broadcast (the
    // reference declares every dim DISTRIBUTION = REPLICATE; broadcast is
    // the Spark analog, so the fact never shuffles through the view). The
    // fixtures carry no borough/zone lookup, so the role-played location
    // columns expose the NKs the reference's zone attributes hang off.
    fact.as("f")
      .join(broadcast(dd).as("d"), col("f.pickup_date_key") === col("d.date_key"))
      .join(broadcast(dt).as("t"), col("f.pickup_time_key") === col("t.time_key"), "left")
      .join(broadcast(dv), Seq("vendor_sk"), "left")
      .join(broadcast(dp), Seq("payment_sk"), "left")
      .join(broadcast(dr), Seq("rate_sk"), "left")
      .join(broadcast(df), Seq("flag_sk"), "left")
      .join(broadcast(dl).as("pu"), col("f.pu_location_sk") === col("pu.loc_sk"), "left")
      .join(broadcast(dl).as("dol"), col("f.do_location_sk") === col("dol.loc_sk"), "left")
      .select(
        col("f.pickup_date_key"), col("d.date_value").as("pickup_date"),
        col("d.is_weekend"), col("d.week_of_year"), col("d.iso_year"), col("d.iso_week"),
        col("f.pickup_time_key"), col("t.hh24").as("pickup_hour"),
        col("t.hour_bucket"), col("t.is_night").as("is_night_ride"),
        col("vendor_nk").as("vendor_code"), col("payment_nk").as("payment_type"),
        col("rate_nk").as("rate_code"), col("flag_nk").as("store_and_fwd_flag"),
        col("pu.loc_nk").as("pickup_location_nk"), col("dol.loc_nk").as("dropoff_location_nk"),
        col("f.trip_distance_km"), col("f.fare_amount"), col("f.tip_amount"),
        col("f.tolls_amount"), col("f.total_amount"),
        when(col("f.fare_amount") > 0,
          col("f.tip_amount") / col("f.fare_amount")).as("tip_pct"),
        when(col("f.trip_distance_km") > 0,
          col("f.fare_amount") / col("f.trip_distance_km")).as("fare_per_km"),
        col("f.ingest_date"), col("f.source_file_name"))
      .createOrReplaceTempView("vw_fact_trip_bi")

    Tables(spark, sfDir, "events").createOrReplaceTempView("stream_events")
    EventsModel.routed(spark, sfDir).createOrReplaceTempView("stream_routed")
    Tables(spark, sfDir, "documents").createOrReplaceTempView("documents")
    Tables(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")

    // Training-data pipeline surface: per-doc signals as lazy views; the
    // near-dup verdict view is backed by the session-scoped components
    // memo (the graph algorithm is iterative, so it runs ONCE here at
    // registration and every later spark.sql touch reuses the labels).
    val docs = graft.docs.DocPipeline.documents(spark, sfDir)
    graft.docs.DocPipeline.qualityScores(docs)
      .join(graft.docs.DocPipeline.repetitionStats(docs), Seq("doc_id"))
      .createOrReplaceTempView("vw_doc_quality")
    graft.queries.Memo.of(spark, s"$sfDir/dup_components") {
      graft.docs.DocPipeline.nearDupComponents(
        graft.docs.DocPipeline.minhashLshPairs(docs, 0.5))
    }.createOrReplaceTempView("vw_doc_dedup")
    // round-4 corpus-assembly surface
    graft.docs.DocPipeline.hashSplit(docs, "doc_id", 80, 10)
      .select("doc_id", "split_bucket", "split")
      .createOrReplaceTempView("vw_doc_splits")
    graft.docs.DocPipeline.corpusStats(docs)
      .createOrReplaceTempView("vw_corpus_stats")

    // raw fixture tables (documents/embeddings already have typed views)
    Tables.names.filterNot(Set("documents", "embeddings"))
      .foreach(n => Tables(spark, sfDir, n).createOrReplaceTempView(n))
  }
}
