package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** As-of join semantics on hand-checkable frames: latest-not-later pick,
  * inclusive equality, NULL before the first version, key isolation. */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  test("backward as-of picks the latest right row at or before each left ts") {
    val left = Seq(
      ("a", 5L, 100L), ("a", 10L, 101L), ("a", 15L, 102L),
      ("b", 10L, 200L),
      ("c", 10L, 300L)).toDF("k", "ts", "row_id")
    val right = Seq(
      ("a", 10L, 1.0), ("a", 12L, 2.0),  // a: versions at 10 and 12
      ("b", 1L, 9.0)).toDF("k", "vts", "rate")
      // c: no versions at all

    val got = AsofJoin.backward(left, right, Seq("k"), "ts", "vts", Seq("rate"))
      .select("k", "row_id", "rate").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap

    assert(got(("a", 100L)).isEmpty, "left ts=5 precedes every version -> NULL")
    assert(got(("a", 101L)).contains(1.0), "ts=10 sees the version AT 10 (inclusive)")
    assert(got(("a", 102L)).contains(2.0), "ts=15 sees the latest earlier version (12)")
    assert(got(("b", 200L)).contains(9.0), "other key resolves independently")
    assert(got(("c", 300L)).isEmpty, "key with no right side stays NULL")
    assert(got.size == 5, "every left row survives (left-join semantics)")
  }

  test("forward as-of picks the earliest right row at or after each left ts") {
    val left = Seq(("a", 5L, 100L), ("a", 12L, 101L), ("a", 20L, 102L))
      .toDF("k", "ts", "row_id")
    val right = Seq(("a", 10L, 1.0), ("a", 12L, 2.0)).toDF("k", "vts", "rate")
    val got = AsofJoin.forward(left, right, Seq("k"), "ts", "vts", Seq("rate"))
      .select("row_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got(100L).contains(1.0), "ts=5 takes the next version (10)")
    assert(got(101L).contains(2.0), "ts=12 sees the version AT 12 (inclusive)")
    assert(got(102L).isEmpty, "nothing at or after ts=20 -> NULL")
  }

  test("payload columns all come from the same right row; NULL fields survive") {
    val left = Seq(("a", 20L)).toDF("k", "ts")
    // newest matching row (vts=15) has rate NULL but src set; per-column
    // last(ignoreNulls) would leak rate=1.0 from the OLDER row and mix rows
    val right = Seq(
      ("a", 10L, Some(1.0), "old"),
      ("a", 15L, None, "new")).toDF("k", "vts", "rate", "src")
    val row = AsofJoin.backward(left, right, Seq("k"), "ts", "vts", Seq("rate", "src"))
      .select("rate", "src").collect().head
    assert(row.isNullAt(0), "matched row's legitimately-NULL rate is preserved")
    assert(row.getString(1) == "new", "both payload columns come from vts=15")
  }

  test("NULL keys never match (equality semantics)") {
    val left = Seq((Option.empty[String], 10L, 1L), (Some("a"), 10L, 2L))
      .toDF("k", "ts", "row_id")
    val right = Seq((Option.empty[String], 5L, 9.0), (Some("a"), 5L, 1.0))
      .toDF("k", "vts", "rate")
    val got = AsofJoin.backward(left, right, Seq("k"), "ts", "vts", Seq("rate"))
      .select("row_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty, "NULL-keyed left row matches nothing")
    assert(got(2L).contains(1.0), "non-null key still resolves")
  }

  test("as-of plan shuffles once per side on the key, no range explosion") {
    val left = (1 to 1000).map(i => ("k" + i % 3, i.toLong, i.toLong))
      .toDF("k", "ts", "row_id")
    val right = (1 to 100).map(i => ("k" + i % 3, i.toLong * 10, i * 1.0))
      .toDF("k", "vts", "rate")
    val joined = AsofJoin.backward(left, right, Seq("k"), "ts", "vts", Seq("rate"))
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no range-join explosion:\n${plan.take(1500)}")
  }

  test("nearest as-of picks the closer side and breaks exact ties backward") {
    val left = Seq(
      ("a", 14L, 100L), // 10 is 4 away, 20 is 6 away -> backward wins
      ("a", 17L, 101L), // 20 is 3 away, 10 is 7 away -> forward wins
      ("a", 15L, 102L), // exact tie (5 vs 5) -> backward (earlier) wins
      ("a", 3L, 103L),  // before every right row -> forward only
      ("b", 50L, 200L)  // key with no right rows -> NULL
    ).toDF("k", "ts", "row_id")
    val right = Seq(("a", 10L, 1.0), ("a", 20L, 2.0)).toDF("k", "vts", "rate")
    val got = AsofJoin.nearest(left, right, Seq("k"), "ts", "vts", Seq("rate"))
      .select("row_id", "rate", "matched_ts").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(100L) == ((Some(1.0), Some(10L))), s"$got")
    assert(got(101L) == ((Some(2.0), Some(20L))))
    assert(got(102L) == ((Some(1.0), Some(10L))), "tie prefers the earlier row")
    assert(got(103L) == ((Some(1.0), Some(10L))), "left of everything -> first row ahead")
    assert(got(200L) == ((None, None)), "no right side stays NULL")
    assert(got.size == 5, "left-join semantics")
  }

  test("tolerance bounds the gap: stale matches revert to NULL, rows survive") {
    val left = Seq(
      ("a", 10L, 100L), // version at 10, gap 0 -> match
      ("a", 14L, 101L), // latest version 12, gap 2 -> match (inclusive bound)
      ("a", 16L, 102L), // latest version 12, gap 4 -> too stale -> NULL
      ("b", 9L, 200L)   // no earlier version -> NULL either way
    ).toDF("k", "ts", "row_id")
    val right = Seq(
      ("a", 10L, 1.0), ("a", 12L, 2.0), ("b", 50L, 9.0)).toDF("k", "vts", "rate")

    val got = AsofJoin.backwardTolerance(
        left, right, Seq("k"), "ts", "vts", Seq("rate"), tolerance = 2L)
      .select("row_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(100L).contains(1.0))
    assert(got(101L).contains(2.0), "gap == tolerance is inside the bound")
    assert(got(102L).isEmpty, "gap 4 > tolerance 2 -> payload cleared")
    assert(got(200L).isEmpty)
    assert(got.size == 4, "left-join row count preserved")

    val fwd = AsofJoin.forwardTolerance(
        left, right, Seq("k"), "ts", "vts", Seq("rate"), tolerance = 2L)
      .select("row_id", "rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fwd(100L).contains(1.0), "version AT ts, gap 0")
    assert(fwd(102L).isEmpty, "no version within 2 ahead of 16")
    assert(fwd(200L).isEmpty, "next version at 50 is 41 ahead -> cleared")

    // requesting the right-ts itself as payload still clears correctly
    val withTs = AsofJoin.backwardTolerance(
        left, right, Seq("k"), "ts", "vts", Seq("rate", "vts"), tolerance = 2L)
      .select("row_id", "vts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(withTs(101L).contains(12L))
    assert(withTs(102L).isEmpty, "out-of-tolerance right ts cleared too")
  }
}
