package graft.batch

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.functions.TaxiFunctions._
import graft.model.TaxiModel

/** Star-schema build (`mdl.*`) — SURVEY.md §2.4 `upsert_dim_antijoin`,
  * `join_fact_dims`, `join_star_view`; ref: sql/batchELT/mdl/.
  *
  * Dims here are *deterministic*: SK = position in the sorted distinct-NK
  * set — the reproducible analog of the reference's IDENTITY columns
  * (SURVEY §7.4 decision 4; `monotonically_increasing_id` is banned from
  * declared queries). At scale the dim domains are tiny and FIXED
  * (vendors, payment types, rates, flags, TLC zones ≤ a few hundred
  * members — bounded by the domain, not the data), so the distinct runs
  * map-side-combined over the fact and the numbering happens on the
  * DRIVER over the collected O(|dim|) census — the same bounded-collect
  * class as k×dims centroids. The resulting dim is a LocalRelation,
  * which makes every fact-side resolve a free broadcast join (no dim
  * lineage recompute, no fact shuffle) and keeps declared plans clear of
  * partition-less windows (PlanGuardSpec bans the shape).
  */
object StarModel {

  /** Driver-side SK numbering of a bounded, already-sorted census:
    * appends `skName` = base + 1-based position as an INT column and
    * returns a LocalRelation. Safe ONLY for domain-bounded frames
    * (callers document their bound); a data-scaled frame must use
    * [[graft.ops.GlobalRowNumber]] instead. */
  private def numbered(sorted: DataFrame, skName: String, base: Int = 0): DataFrame = {
    val rows = sorted.collect() // O(|dim domain|)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        skName, org.apache.spark.sql.types.IntegerType, nullable = false))
    val data: java.util.List[Row] = java.util.Arrays.asList(
      rows.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (base + i + 1)) }: _*)
    sorted.sparkSession.createDataFrame(data, schema)
  }

  /** Deterministic dim from the distinct non-null NKs of `src(col)`. */
  def dim(src: DataFrame, nkCol: String, nkName: String, skName: String): DataFrame =
    numbered(src.select(col(nkCol).as(nkName)).filter(col(nkName).isNotNull)
      .distinct().orderBy(nkName), skName)

  /** Role-played location dim: distinct union of PU and DO ids
    * (ref: 14_dim_location.upsert.sql:4-11, `setop_union_distinct`). */
  def dimLocation(deduped: DataFrame): DataFrame =
    numbered(deduped.select(col("pu_location_id").as("loc_nk"))
      .union(deduped.select(col("do_location_id")))
      .filter(col("loc_nk").isNotNull).distinct().orderBy("loc_nk"), "loc_sk")

  /** Anti-join dim upsert (ref: 10_dim_vendor.upsert.sql:3-14): append the
    * NKs present in `src` but missing from `existing`, with SKs continuing
    * after max(existing). The anti join ships only the distinct new NKs
    * (domain-bounded, like [[dim]]); `existing` stays distributed. */
  def upsertDim(existing: DataFrame, src: DataFrame, nkCol: String,
                nkName: String, skName: String): DataFrame = {
    val newNks = src.select(col(nkCol).as(nkName)).filter(col(nkName).isNotNull)
      .distinct()
      .join(existing.select(nkName), Seq(nkName), "left_anti")
      .orderBy(nkName)
    val mx = existing.agg(coalesce(max(col(skName)), lit(0)).cast("int"))
      .first().getInt(0)
    // allowMissingColumns: an SCD1-refreshed dim may carry attribute
    // columns beyond (nk, sk) — a fresh member starts with NULL
    // attributes until the next refresh names it, exactly like a row
    // predating the column under additive schema evolution
    existing.unionByName(numbered(newNks, skName, base = mx),
      allowMissingColumns = true)
  }

  /** Fact load (ref: 40_fact_trip.load.sql:70-107): SHA-256 degenerate
    * trip_id, smart date/time keys, 6 broadcast NK→SK resolves with
    * COALESCE(-1) unknown fallback, `dim_location` role-played twice. */
  def fact(deduped: DataFrame, dimVendor: DataFrame, dimPayment: DataFrame,
           dimRate: DataFrame, dimFlag: DataFrame, dimLoc: DataFrame): DataFrame = {
    val d = deduped
    d.join(broadcast(dimVendor), d("vendor_code") === dimVendor("vendor_nk"), "left")
      .join(broadcast(dimPayment), d("payment_type") === dimPayment("payment_nk"), "left")
      .join(broadcast(dimRate), d("rate_code") === dimRate("rate_nk"), "left")
      .join(broadcast(dimFlag), d("flag_raw") === dimFlag("flag_nk"), "left")
      .join(broadcast(dimLoc.as("pu")), d("pu_location_id") === col("pu.loc_nk"), "left")
      .join(broadcast(dimLoc.as("dol")), d("do_location_id") === col("dol.loc_nk"), "left")
      .select(
        TaxiModel.tripId.as("trip_id"),
        dateKey(col("pickup_ts_utc")).as("pickup_date_key"),
        timeKey(col("pickup_ts_utc")).as("pickup_time_key"),
        coalesce(col("vendor_sk"), lit(-1)).as("vendor_sk"),
        coalesce(col("payment_sk"), lit(-1)).as("payment_sk"),
        coalesce(col("rate_sk"), lit(-1)).as("rate_sk"),
        coalesce(col("flag_sk"), lit(-1)).as("flag_sk"),
        coalesce(col("pu.loc_sk"), lit(-1)).as("pu_location_sk"),
        coalesce(col("dol.loc_sk"), lit(-1)).as("do_location_sk"),
        col("trip_distance_km"), col("fare_amount"), col("tip_amount"),
        col("tolls_amount"), col("total_amount"), col("is_night_ride"),
        col("ingest_date"), col("source_file_name"), col("loaded_at"))
  }

  /** Weekday index with Sunday=0, from epoch-day arithmetic so Spark and
    * the DuckDB oracle agree independently of locale / DATEFIRST settings
    * (1970-01-01 was a Thursday → offset +4). */
  private def dow0(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (datediff(d, to_date(lit("1970-01-01"))) + 4) % 7

  /** Calendar dimension spanning the dates present in `deduped`'s pickup
    * timestamps (ref: mdl/dim_date.table.sql:5-15). The reference ships
    * DDL only — no population script — so the attribute semantics are
    * pinned here: `iso_year`/`iso_week` are ISO-8601; `week_of_year` is
    * the T-SQL `DATEPART(week)` convention (week 1 contains Jan 1, weeks
    * break on Sunday); `is_holiday` defaults false per the DDL DEFAULT 0.
    *
    * Scale: two-phase — an all-to-one min/max agg (partial-aggregated,
    * O(1) rows shuffled) then a single-row sequence explode producing
    * O(span-days) rows. The dim is tiny by construction (decades ≈ 10k
    * rows) and is always broadcast at join sites, replicating the
    * reference's DISTRIBUTION = REPLICATE. */
  def dimDate(deduped: DataFrame): DataFrame = {
    val d = col("date_value")
    deduped
      .agg(min(to_date(col("pickup_ts_utc"))).as("lo"),
           max(to_date(col("pickup_ts_utc"))).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("date_value"))
      .select(
        (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast("int").as("date_key"),
        d,
        year(d).cast("int").as("year"),
        quarter(d).cast("int").as("quarter"),
        month(d).cast("int").as("month"),
        dayofmonth(d).cast("int").as("day"),
        (floor((dayofyear(d) - 1 + dow0(trunc(d, "year"))) / 7) + 1)
          .cast("int").as("week_of_year"),
        expr("extract(YEAROFWEEK FROM date_value)").cast("int").as("iso_year"),
        weekofyear(d).cast("int").as("iso_week"),
        dow0(d).isin(0, 6).as("is_weekend"),
        lit(false).as("is_holiday"))
  }

  /** Seconds-of-day dimension, one row per `time_key` 0..86399
    * (ref: mdl/dim_time.table.sql:5-10): hh/mm/ss split, display
    * `hour_bucket` ('22:00-22:59'), and the [22,5] `is_night` flag the
    * BI view exposes as `is_night_ride`. Fixed 86400 rows — generated,
    * broadcast, never shuffled. */
  def dimTime(spark: SparkSession): DataFrame = {
    val hh = (col("id") / 3600).cast("int")
    spark.range(0, 86400).select(
      col("id").cast("int").as("time_key"),
      hh.as("hh24"),
      ((col("id") % 3600) / 60).cast("int").as("mm"),
      (col("id") % 60).cast("int").as("ss"),
      format_string("%02d:00-%02d:59", hh, hh).as("hour_bucket"),
      (hh >= 22 || hh <= 5).as("is_night"))
  }

  /** Star build over an (ideally cached/materialized) deduped core —
    * each dim derives from the same frame, so pass one that won't be
    * recomputed per dim. */
  def factFromDeduped(deduped: DataFrame): DataFrame = {
    // The five dim censuses are independent bounded jobs over the same
    // (materialized) deduped frame — submit them concurrently so the
    // once-per-run star build's wall time is max(dim), not sum(dim).
    // Each is deterministic (sorted distinct + driver numbering), so
    // concurrency cannot change a single SK.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val dv = Future(dim(deduped, "vendor_code", "vendor_nk", "vendor_sk"))
      val dp = Future(dim(deduped, "payment_type", "payment_nk", "payment_sk"))
      val dr = Future(dim(deduped, "rate_code", "rate_nk", "rate_sk"))
      val df = Future(dim(deduped, "flag_raw", "flag_nk", "flag_sk"))
      val dl = Future(dimLocation(deduped))
      fact(deduped, Await.result(dv, Duration.Inf), Await.result(dp, Duration.Inf),
        Await.result(dr, Duration.Inf), Await.result(df, Duration.Inf),
        Await.result(dl, Duration.Inf))
    } finally pool.shutdown()
  }

  /** Full chain from the fixtures: trips→cleaned→deduped→dims→fact. */
  def factFromFixtures(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = TaxiModel.deduped(TaxiModel.cleaned(
      TaxiModel.tripsWithDups(spark, sfDir), TaxiModel.paymentTypeMap(spark)))
    fact(deduped,
      dim(deduped, "vendor_code", "vendor_nk", "vendor_sk"),
      dim(deduped, "payment_type", "payment_nk", "payment_sk"),
      dim(deduped, "rate_code", "rate_nk", "rate_sk"),
      dim(deduped, "flag_raw", "flag_nk", "flag_sk"),
      dimLocation(deduped))
  }
}
