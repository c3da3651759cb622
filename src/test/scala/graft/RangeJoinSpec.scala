package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bin-bucketized range join: exact containment, overlap multiplicity,
  * inclusive bounds, and the no-cross-product plan shape. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("point-in-interval matches every containing interval exactly once") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 100L)).toDF("id", "p")
    val ivs = Seq(
      ("a", 0L, 10L),    // contains 5 and 10 (inclusive hi)
      ("b", 10L, 30L),   // contains 10 (inclusive lo) and 25
      ("c", 20L, 26L))   // contains 25 — overlaps b
      .toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 7L)
      .select("id", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (3L, "c")),
      s"exact containment incl. boundary + overlap multiplicity: $got")
    // each pair exactly once even when an interval spans many bins
    val counts = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 3L)
      .groupBy("id", "iv").count().filter(col("count") > 1).count()
    assert(counts == 0, "no duplicate pairs from multi-bin intervals")
  }

  test("optimizer rule rewrites a naive BETWEEN join when binWidth is set") {
    val pts = (1 to 500).map(i => (i.toLong, (i % 300).toLong)).toDF("id", "p")
    val ivs = (0 until 30).map(i => (s"iv$i", i * 10L, i * 10L + 9L)).toDF("iv", "lo", "hi")
    pts.createOrReplaceTempView("rj_pts")
    ivs.createOrReplaceTempView("rj_ivs")
    val sql = "SELECT id, iv FROM rj_pts JOIN rj_ivs ON p >= lo AND p <= hi"

    val before = spark.sql(sql).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(spark.sql(sql).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "naive BETWEEN join is a nested loop")

    spark.conf.set("spark.graft.rangeJoin.binWidth", "10")
    try {
      val after = spark.sql(sql)
      val plan = after.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule must produce an equi-join:\n${plan.take(1500)}")
      assert(after.collect().map(r => (r.getLong(0), r.getString(1))).toSet == before,
        "rewrite preserves results exactly")
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("a malformed binWidth conf disables the rewrite instead of failing queries") {
    val pts = (1 to 50).map(i => (i.toLong, i.toLong)).toDF("id", "p")
    val ivs = Seq(("iv0", 0L, 25L)).toDF("iv", "lo", "hi")
    pts.createOrReplaceTempView("rjm_pts")
    ivs.createOrReplaceTempView("rjm_ivs")
    spark.conf.set("spark.graft.rangeJoin.binWidth", "not-a-number")
    try {
      // every query in the session must still run; the rewrite is just off
      val n = spark.sql(
        "SELECT id FROM rjm_pts JOIN rjm_ivs ON p >= lo AND p <= hi").count()
      assert(n == 25)
      assert(spark.sql("SELECT 1").collect().head.getInt(0) == 1)
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("plan is an equi-join on the bin — no cartesian / nested loop") {
    val pts = (1 to 1000).map(i => (i.toLong, i.toLong % 500)).toDF("id", "p")
    val ivs = (0 until 50).map(i => (s"iv$i", i * 10L, i * 10L + 9L)).toDF("iv", "lo", "hi")
    val joined = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 10L)
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n${plan.take(1500)}")
  }
}
