package graft

/** SQL surface: every registered view answers spark.sql, and the star
  * views reconcile. */
class CatalogSpec extends SparkSpec {

  test("registerAll exposes the engine over spark.sql") {
    Catalog.registerAll(spark, sf())
    Catalog.views.foreach { v =>
      assert(spark.sql(s"SELECT * FROM $v LIMIT 1").collect().length <= 1)
    }
    val kpi = spark.sql(
      """SELECT vendor_nk, count(*) AS trips,
        |  sum(fare_amount) / nullif(sum(trip_distance_km), 0) AS fare_per_km
        |FROM vw_fact_trip_bi GROUP BY vendor_nk ORDER BY vendor_nk""".stripMargin)
    assert(kpi.count() >= 5)
    // fact == core conservation through the SQL surface
    val Array(coreN, factN) = spark.sql(
      "SELECT (SELECT count(*) FROM core_trip_clean), (SELECT count(*) FROM fact_trip)")
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(coreN == factN && coreN > 0)
    // pushdown reaches the scan through the view layer
    val plan = spark.sql(
      "SELECT trip_src_id FROM raw_trips WHERE ingest_date = DATE '1997-03-01'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("GraftExtensions registers sha256_prefix64 as a SQL function") {
    val got = spark.sql("SELECT sha256_prefix64('abc') AS h").collect()(0).getLong(0)
    val expected = graft.functions.Sha256Prefix64Util.hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    assert(got == expected && got >= 0)
  }
}
