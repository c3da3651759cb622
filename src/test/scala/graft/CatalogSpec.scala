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
      """SELECT vendor_code, count(*) AS trips,
        |  sum(fare_amount) / nullif(sum(trip_distance_km), 0) AS fare_per_km
        |FROM vw_fact_trip_bi GROUP BY vendor_code ORDER BY vendor_code""".stripMargin)
    assert(kpi.count() >= 5)
    // the bread-and-butter calendar slice the dims exist for: weekend vs
    // weekday (ref: vw_fact_trip_bi.view.sql joins dim_date first)
    val wk = spark.sql(
      """SELECT is_weekend, count(*) AS trips, sum(fare_amount) AS fare
        |FROM vw_fact_trip_bi GROUP BY is_weekend""".stripMargin).collect()
    assert(wk.length == 2 && wk.forall(_.getLong(1) > 0))
    // view row count conserves through the 8-join flatten (dim_date inner
    // join always matches: fact dates are inside the deduped span)
    assert(spark.sql("SELECT count(*) FROM vw_fact_trip_bi").collect()(0).getLong(0) ==
      spark.sql("SELECT count(*) FROM fact_trip").collect()(0).getLong(0))
    // dim_time is the full seconds-of-day domain
    assert(spark.sql("SELECT count(*) FROM dim_time").collect()(0).getLong(0) == 86400L)
    // training-data surface answers spark.sql: quality signals join the
    // dedup verdicts, and keepers are a subset of the corpus
    val dq = spark.sql(
      """SELECT count(*) AS flagged FROM vw_doc_quality q
        |JOIN vw_doc_dedup d ON q.doc_id = d.doc_id
        |WHERE NOT d.is_keeper""".stripMargin).collect()(0).getLong(0)
    assert(dq >= 0)
    assert(spark.sql("SELECT count(*) FROM vw_doc_dedup WHERE is_keeper").collect()(0)
      .getLong(0) <= spark.sql("SELECT count(*) FROM documents").collect()(0).getLong(0))
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

  test("asof_join is SQL-callable and matches the Scala API") {
    val s = spark
    import s.implicits._
    Seq(("a", 10L, 1L), ("a", 25L, 2L), ("b", 5L, 3L), ("c", 7L, 4L))
      .toDF("k", "ts", "row_id").createOrReplaceTempView("asof_l")
    Seq(("a", 8L, 1.0, "x"), ("a", 20L, 2.0, "y"), ("b", 9L, 3.0, "z"))
      .toDF("k", "vts", "rate", "src").createOrReplaceTempView("asof_r")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val viaSql = spark.sql(
        s"""SELECT * FROM asof_join('asof_l', 'asof_r', 'k', 'ts', 'vts',
           |                        'rate,src', '$dir')""".stripMargin)
        .orderBy("row_id").collect().toSeq
      val api = dir match {
        case "backward" => graft.ops.AsofJoin.backward(
          spark.table("asof_l"), spark.table("asof_r"),
          Seq("k"), "ts", "vts", Seq("rate", "src"))
        case "forward" => graft.ops.AsofJoin.forward(
          spark.table("asof_l"), spark.table("asof_r"),
          Seq("k"), "ts", "vts", Seq("rate", "src"))
        case _ => graft.ops.AsofJoin.nearest(
          spark.table("asof_l"), spark.table("asof_r"),
          Seq("k"), "ts", "vts", Seq("rate", "src"))
      }
      assert(viaSql == api.orderBy("row_id").collect().toSeq, s"direction=$dir")
    }
    // sanity on the backward semantics through SQL: a@25 matches vts=20
    val r = spark.sql(
      """SELECT rate FROM asof_join('asof_l','asof_r','k','ts','vts','rate')
        |WHERE row_id = 2""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 2.0)

    // 8th arg = tolerance: SQL == API, and the stale match (a@25 vs
    // vts=20, gap 5 > 3) reverts to NULL while the row survives
    for (dir <- Seq("backward", "forward")) {
      val viaSql = spark.sql(
        s"""SELECT * FROM asof_join('asof_l', 'asof_r', 'k', 'ts', 'vts',
           |                        'rate,src', '$dir', 3)""".stripMargin)
        .orderBy("row_id").collect().toSeq
      val api = (if (dir == "backward") graft.ops.AsofJoin.backwardTolerance _
                 else graft.ops.AsofJoin.forwardTolerance _)(
        spark.table("asof_l"), spark.table("asof_r"),
        Seq("k"), "ts", "vts", Seq("rate", "src"), 3L)
      assert(viaSql == api.orderBy("row_id").collect().toSeq, s"direction=$dir tol=3")
    }
    val tol = spark.sql(
      """SELECT row_id, rate
        |FROM asof_join('asof_l','asof_r','k','ts','vts','rate','backward', 3)
        |ORDER BY row_id""".stripMargin).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tol(1L).contains(1.0), "a@10 matches vts=8, gap 2 <= 3")
    assert(tol(2L).isEmpty, "a@25's latest version (20) is 5 behind -> cleared")
    assert(tol.size == 4, "left-join row count preserved through the bound")
  }

  test("range_join TVF is SQL-callable and matches the Scala API") {
    val s = spark
    import s.implicits._
    Seq(1L, 5L, 12L, 23L, 35L).toDF("p").createOrReplaceTempView("rtf_pts")
    Seq((0L, 9L, "lo"), (10L, 19L, "mid"), (20L, 30L, "hi"))
      .toDF("lo", "hi", "tag").createOrReplaceTempView("rtf_ivs")
    val viaSql = spark.sql(
      "SELECT p, tag FROM range_join('rtf_pts','rtf_ivs','p','lo','hi', 7)")
      .orderBy("p").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val api = graft.ops.RangeJoin.pointInInterval(
        spark.table("rtf_pts"), spark.table("rtf_ivs"), "p", "lo", "hi", 7L)
      .orderBy("p").select("p", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSql == api)
    assert(viaSql == Seq((1L, "lo"), (5L, "lo"), (12L, "mid"), (23L, "hi")))
  }

  test("snapshot_at TVF: SQL time travel matches the Scala readVersion API") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("k BIGINT, part STRING")
    // two-version unpartitioned table
    val dir = tmpDir("snap_sql")
    val t = graft.ops.SnapshotTable(spark, dir, schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "part"))
    t.overwrite(Seq((9L, "z")).toDF("k", "part"))
    def ks(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Long]("k")).sorted.toSeq
    assert(ks(spark.sql(s"SELECT * FROM snapshot_at('$dir', 1)").collect()) ==
      ks(t.readVersion(1).collect()))
    assert(ks(spark.sql(s"SELECT * FROM snapshot_at('$dir', 1)").collect()) == Seq(1L, 2L))
    // no version argument = latest
    assert(ks(spark.sql(s"SELECT * FROM snapshot_at('$dir')").collect()) == Seq(9L))

    // partitioned table: partition column recovered, untouched partition
    // served across versions
    val pdir = tmpDir("snap_sql_part")
    val pt = graft.ops.SnapshotTable(spark, pdir, schema, Seq("part"))
    pt.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "part"))
    pt.overwritePartitions(Seq((10L, "a")).toDF("k", "part"))
    val got = spark.sql(s"SELECT k, part FROM snapshot_at('$pdir')")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq(2L -> "b", 10L -> "a"))
    assert(ks(spark.sql(s"SELECT * FROM snapshot_at('$pdir', 1)").collect()) ==
      Seq(1L, 2L))

    // unknown version raises AnalysisException naming the committed ones
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM snapshot_at('$dir', 42)").collect()
    }
    assert(ex.getMessage.contains("committed versions"))
  }

  test("snapshot_history TVF: SQL audit trail matches the Scala history API") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("k BIGINT, part STRING")
    val dir = tmpDir("snap_hist_sql")
    val t = graft.ops.SnapshotTable(spark, dir, schema, Seq("part"))
    t.append(Seq((1L, "a")).toDF("k", "part"))
    t.append(Seq((2L, "a")).toDF("k", "part"))
    t.compact()
    val rows = spark.sql(s"SELECT * FROM snapshot_history('$dir') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      t.history.map(c => (c.version, c.op)))
    assert(rows.map(_._2).toSeq == Seq("append", "append", "compact"))
    assert(rows.forall(_._3 != null), "commit timestamps recorded")
    val ex2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM snapshot_history('${dir}_nope')").collect()
    }
    assert(ex2.getMessage.contains("no snapshot manifests"))
  }

  test("BETWEEN range join is SQL-reachable (RangeJoinRule rewrite, no CartesianProduct)") {
    val s = spark
    import s.implicits._
    Seq(1L, 5L, 12L, 23L).toDF("p").createOrReplaceTempView("rj_pts")
    Seq((0L, 9L, "lo"), (10L, 19L, "mid"), (20L, 29L, "hi"))
      .toDF("lo", "hi", "tag").createOrReplaceTempView("rj_ivs")
    spark.conf.set("spark.graft.rangeJoin.binWidth", "10")
    try {
      val q = spark.sql(
        """SELECT p, tag FROM rj_pts JOIN rj_ivs
          |ON p >= lo AND p <= hi ORDER BY p""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"range join must bucketize, got:\n$plan")
      assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "lo"), (5L, "lo"), (12L, "mid"), (23L, "hi")))
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }
}
