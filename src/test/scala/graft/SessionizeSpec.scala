package graft

import graft.ops.Sessionize

/** Event-level gap sessionization on a hand-checkable timeline. */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  private val gap = 100L

  test("session breaks exactly where the gap exceeds the timeout") {
    val ev = Seq(
      // user 1: [0, 50, 150] then a 101 gap then [251, 300]
      (1L, 0L, 10L), (2L, 50L, 10L), (3L, 150L, 10L),
      (4L, 251L, 10L), (5L, 300L, 10L),
      // user 2: single event = its own session
      (6L, 7L, 20L),
      // user 3: equal timestamps — tiebreak keeps the count deterministic;
      // gap of exactly `gap` does NOT break (strictly greater does)
      (7L, 0L, 30L), (8L, 0L, 30L), (9L, 100L, 30L))
      .toDF("event_id", "ts_us", "user_id")
    val got = Sessionize.assign(ev, Seq("user_id"), "ts_us", Seq("event_id"), gap)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((1L, true)) && got(2L) == ((1L, false)) &&
      got(3L) == ((1L, false)), s"50/100 gaps stay in session 1: $got")
    assert(got(4L) == ((2L, true)) && got(5L) == ((2L, false)),
      "a 101 gap at timeout 100 starts session 2")
    assert(got(6L) == ((1L, true)), "a lone event is a session")
    assert(got(7L) == ((1L, true)) && got(8L) == ((1L, false)) &&
      got(9L) == ((1L, false)), "ties share a session; gap == timeout holds")
  }

  test("one exchange: break flag and running count share the window partitioning") {
    val ev = Seq((1L, 0L, 1L)).toDF("event_id", "ts_us", "user_id")
    val plan = Sessionize.assign(ev, Seq("user_id"), "ts_us", Seq("event_id"), gap)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"lag + running sum must reuse one hash partitioning, got:\n$plan")
    assert("\\+- Sort ".r.findAllIn(plan).length == 1,
      s"the second Window must reuse the first's sort order, got:\n$plan")
  }
}
