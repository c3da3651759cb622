package graft

import org.apache.spark.sql.functions._

import graft.perf.Skew

/** Scale techniques: bucketed co-located joins (no shuffle on the join
  * key) and salted skew joins (equal results, spread hot keys). */
class PerfTechniquesSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed tables join without a shuffle on the join key") {
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    // DROP on a fresh metastore doesn't clear a dir left by a previous
    // JVM — remove the physical locations too
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("fact_b", "dim_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del)); f.delete(): Unit
        }
        del(d)
      }
    }
    val fact = (1L to 10000L).map(i => (i % 500, i, i * 1.5)).toDF("k", "id", "v")
    val dim = (0L until 500L).map(i => (i, s"name$i")).toDF("k", "name")
    fact.write.mode("overwrite").bucketBy(8, "k").saveAsTable("fact_b")
    dim.write.mode("overwrite").bucketBy(8, "k").saveAsTable("dim_b")

    val joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
    // bucketed co-location: with auto-broadcast off, the join must run
    // with NO shuffle exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 10000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("z-order bounds BOTH dimensions per chunk; a single-column sort does not") {
    import graft.perf.ZOrder
    // the full 64×64 grid: z codes are a permutation of 0..4095, so each
    // 256-row chunk is an aligned 16×16 tile
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
      .withColumn("zval", ZOrder.zValue(col("x"), col("y"), 6))
    assert(grid.select("zval").distinct().count() == 4096,
      "6-bit interleave is a bijection on the 64×64 grid")

    def maxSpan(ordered: org.apache.spark.sql.DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("ord", "x", "y")
      ordered.withColumn("chunk", ntile(16).over(w))
        .groupBy("chunk")
        .agg(greatest(max("x") - min("x"), max("y") - min("y"))
          .cast("long").as("span"))
        .agg(max("span")).head().getLong(0)
    }
    val zSpan = maxSpan(grid.withColumn("ord", col("zval")))
    val xSpan = maxSpan(grid.withColumn("ord", col("x").cast("long")))
    assert(zSpan == 15, s"z chunks are 16x16 tiles: worst dim span $zSpan")
    assert(xSpan == 63, s"x-sorted chunks leave y unbounded: $xSpan")
  }

  test("dynamic partition pruning puts a runtime filter on the partitioned scan") {
    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    (1 to 1000).map(i => (i.toLong, f"2024-${i % 12 + 1}%02d"))
      .toDF("id", "month")
      .write.mode("overwrite").partitionBy("month").parquet(s"$base/fact")
    (1 to 12).map(i => (f"2024-$i%02d", i)).toDF("month", "mno")
      .write.mode("overwrite").parquet(s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim").filter(col("mno") <= 2)
    val j = fact.join(broadcast(dim), "month")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a runtime partition filter:\n${plan.take(2000)}")
    assert(j.count() == 167, "months 01+02 = 83 + 84 rows")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // the shuffle-join sibling of dynamic partition pruning: when a
    // selective filter sits on the build side, the optimizer ships a
    // bloom filter of surviving keys to the probe side so most fact rows
    // die BEFORE the shuffle — at 100 TB this is the difference between
    // shuffling the whole fact and shuffling the matching slice. Tiny
    // local frames sit under the default size thresholds, so the test
    // zeroes them; production keeps the defaults.
    val base = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (1L to 20000L).map(i => (i % 2000, i)).toDF("k", "id")
      .write.mode("overwrite").parquet(s"$base/fact")
    (0L until 2000L).map(i => (i, i % 97)).toDF("k", "grp")
      .write.mode("overwrite").parquet(s"$base/dim")
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prior = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim").filter(col("grp") === 0)
      val j = fact.join(dim, "k")
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"probe side must carry an injected bloom filter:\n${plan.take(2000)}")
      // 21 surviving dim keys × 10 fact rows each
      assert(j.count() == 210, "bloom filter must not change the result")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals the plain join on a skewed key") {
    // hot key 0 holds 90% of rows
    val left = ((1 to 9000).map(_ => 0L) ++ (1 to 1000).map(_.toLong))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
    val right = (0L to 1000L).map(i => (i, s"v$i")).toDF("k", "payload")

    val plain = left.join(right, Seq("k")).select("k", "row_id", "payload")
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
      .select("k", "row_id", "payload")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    val saltedDet = Skew.saltedJoinDeterministic(left, right, "k", "row_id", 8)
      .select("k", "row_id", "payload")
    assert(saltedDet.exceptAll(plain).isEmpty && plain.exceptAll(saltedDet).isEmpty)
  }

  test("scalable global row_number: equals the naive window, never a single-task sort") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (s"g${i % 7}", i.toLong)).toDF("grp", "id")
    val got = graft.ops.GlobalRowNumber.withRowNumber(df, "rn", Seq("grp", "id"), 8)
    val naive = df.withColumn("rn", org.apache.spark.sql.functions.row_number()
      .over(org.apache.spark.sql.expressions.Window.orderBy("grp", "id"))
      .cast("long")) // the scalable op emits LONG so > 2^31 rows can't wrap
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "two-pass numbering must equal the single-partition window exactly")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"no window at all — numbering is a projection over the id encoding:\n${plan.take(1500)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"one range shuffle only — no re-clustering exchange:\n${plan.take(1500)}")
  }

  test("scalable prefix sum equals the naive running total") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i.toLong, (i % 37 + 1).toLong)).toDF("id", "v")
    val got = graft.ops.GlobalPrefixSum.withRunningTotal(df, "v", "cum", Seq("id"), 8)
    val naive = df.withColumn("cum", org.apache.spark.sql.functions.sum("v")
      .over(org.apache.spark.sql.expressions.Window.orderBy("id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("round-5 ops keep their scale-critical plan shapes") {
    val d = sf()
    // retrieval + sketch + privacy: the corpus side may shuffle on its
    // aggregation keys, but no query may ever plan a CartesianProduct,
    // and the small side (query terms, df table, census, top-k probes)
    // must broadcast — a SortMergeJoin would mean the Zipf-bounded side
    // got shuffled like a fact table
    Seq("search_bm25", "text_tfidf", "anonymize_k")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$q must not plan a cartesian product:\n${plan.take(1500)}")
        assert(!plan.contains("SortMergeJoin"),
          s"$q joins its bounded sides broadcast, never sort-merge:\n${plan.take(1500)}")
        assert(plan.contains("BroadcastHashJoin"),
          s"$q must broadcast its small side:\n${plan.take(1500)}")
      }
    // agg_heavyhitters_cms now returns an eagerly-checkpointed ≤topK-row
    // frame (census cached across its two actions, round 12), so its
    // broadcast joins are explicit broadcast() calls that execute INSIDE
    // the op — the returned plan is just the checkpoint scan. Assert the
    // checkpoint shape and that nothing big leaked into the result.
    val cms = SparkEntry.queries("agg_heavyhitters_cms")(spark, d)
    assert(cms.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "cms result is the eager checkpoint, not a live corpus-scale plan")
    assert(cms.count() <= 10, "cms returns the top-k rows only")
    // the z-value projection and chunk stats never pair-explode
    val zo = SparkEntry.queries("cluster_zorder")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!zo.contains("CartesianProduct") && !zo.contains("BroadcastNestedLoopJoin"),
      s"z-order stats never pair-explode:\n${zo.take(1500)}")
  }

  test("round-4 ops keep their scale-critical plan shapes") {
    val d = sf()
    // split + C4 rules: narrow projections — join-free, no hash shuffle
    Seq("split_hash", "filter_c4_rules").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("Join") && !plan.contains("Exchange hashpartitioning"),
        s"$q must stay a narrow projection:\n${plan.take(1500)}")
    }
    // paragraph dedup: window + reassembly joins, never a product
    val para = SparkEntry.queries("dedup_paragraph")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!para.contains("CartesianProduct") && !para.contains("BroadcastNestedLoopJoin"),
      s"paragraph dedup has no pair explosion:\n${para.take(1500)}")
    // bloom decontamination returns eagerly (cache-hygiene localCheckpoint),
    // so its plan is an ExistingRDD scan — assert the prefilter's shape on a
    // directly-built probe instead: the codegen bloom_might_contain
    // expression stays inside a whole-stage-codegen span, no Scala UDF.
    import spark.implicits._
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
    (1L to 50L).foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)
    // spark.range keeps a real scan in the plan (a local Seq would fold
    // into a LocalTableScan at optimization time and hide the filter)
    val probe = spark.range(1, 200).toDF("h")
      .filter(graft.functions.BloomMightContain.mightContain(bc, org.apache.spark.sql.functions.col("h")))
    val bloomPlan = probe.queryExecution.executedPlan.toString
    assert(bloomPlan.contains("bloom_might_contain") && !bloomPlan.contains("UDF"),
      s"codegen bloom probe, not a UDF:\n${bloomPlan.take(1500)}")
    // executedPlan.toString marks whole-stage-codegen spans with "*(n)"
    assert(bloomPlan.contains("*(1) Filter bloom_might_contain"),
      s"bloom prefilter must stay inside a codegen span:\n${bloomPlan.take(1500)}")
  }

  test("round-3 ops keep their scale-critical plan shapes") {
    val d = sf()
    // calendar slice: every dim joins as broadcast — the fact side never
    // sort-merge-joins (REPLICATE analog)
    val cal = SparkEntry.queries("join_calendar")(spark, d)
      .queryExecution.executedPlan.toString
    assert(cal.contains("BroadcastHashJoin") && !cal.contains("SortMergeJoin"),
      s"join_calendar must broadcast its dims:\n${cal.take(2000)}")
    // decontamination: the (tiny) eval side broadcasts into the corpus scan
    val cont = SparkEntry.queries("contamination_ngram")(spark, d)
      .queryExecution.executedPlan.toString
    assert(cont.contains("BroadcastHashJoin"),
      "contamination joins the eval set by broadcast")
    // stratified sampling: a narrow projection — the scan reads only the
    // two columns the query returns, and no join/aggregate appears
    val samp = SparkEntry.queries("sample_stratified")(spark, d)
      .queryExecution.executedPlan.toString
    assert(samp.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"sample must prune to (doc_id, lang):\n${samp.take(2000)}")
    assert(!samp.contains("Join"), "sample is join-free")
  }

  test("olap shapes: predicates reach the parquet scans, dims broadcast") {
    val d = sf()
    // toString elides long PushedFilters lists — formatted mode prints
    // them in full, which is what these assertions need
    def formatted(name: String) = SparkEntry.queries(name)(spark, d)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // Q6: every predicate — including the date bounds written as
    // cast(ts as date) — must be unwrapped and pushed to the reader
    val q6 = formatted("olap_revenue_forecast")
    assert(q6.contains("GreaterThanOrEqual(l_shipdate") &&
      q6.contains("LessThan(l_quantity,24.0)"),
      s"Q6 predicates must be in PushedFilters:\n${q6.take(2000)}")
    // Q3: segment filter pushed into the customer scan; dim broadcast
    val q3 = formatted("olap_shipping_priority")
    assert(q3.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter must reach the customer scan:\n${q3.take(2000)}")
    assert(q3.contains("BroadcastHashJoin"), "customer side broadcasts")
    // Q4: EXISTS plans as a semi join, not inner+distinct
    val q4 = formatted("olap_priority_exists")
    assert(q4.contains("LeftSemi"), s"EXISTS must be LeftSemi:\n${q4.take(2000)}")
    // Q22: NOT EXISTS plans as an anti join
    val q22 = formatted("olap_churned_customers")
    assert(q22.contains("LeftAnti"), s"NOT EXISTS must be LeftAnti:\n${q22.take(2000)}")
  }

  test("after warm() the fact chain is cache-backed (memo wiring)") {
    // Bench steady-state depends on this: if the memo loses its cache,
    // every fact-side query silently rebuilds the clean→dedupe→star
    // chain per run instead of reading the materialization once.
    val d = sf()
    graft.queries.TaxiQueries.warm(spark, d)
    val plan = SparkEntry.queries("join_fact_dims")(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("InMemoryRelation"),
      s"join_fact_dims must read the cached fact memo:\n${plan.take(800)}")
  }

  test("windowedQuantile carries its histogram in ONE aggregation (mergeable state)") {
    // The streaming claim: O(bins) counters accumulate in a single agg and
    // the quantile assembles statelessly — a second aggregate would make
    // the op un-streamable (multiple stateful aggs are rejected) and a
    // second shuffle at batch. Plan must show exactly one hash-partition
    // exchange (the groupBy) before the final output sort.
    val df = (1 to 1000).map(i => (f"2024-01-01T${i % 4}%02d:00:00", "curated",
        (i % 97).toDouble))
      .toDF("ts", "sink", "fare_amount")
      .withColumn("arrival_ts", col("ts").cast("timestamp_ntz"))
    val q = graft.stream.WindowedStats.windowedQuantile(
      df, "fare_amount", 0.0, 100.0, 10, 0.5)
    val plan = q.queryExecution.executedPlan.toString
    val aggExchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(aggExchanges == 1,
      s"expected exactly one hash exchange (the windowed groupBy), got $aggExchanges:\n${plan.take(1200)}")
    // and the estimate is the sketch answer on the same group
    val est = q.filter(col("sink") === "curated").orderBy("hour_start")
      .select("est").collect().map(_.getDouble(0))
    assert(est.nonEmpty && est.forall(e => e >= 0.0 && e <= 100.0))
  }
}
