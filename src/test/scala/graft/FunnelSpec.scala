package graft

import graft.ops.Funnel

/** Ordered-funnel semantics on hand-built event logs. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  test("a click before the first view is not a conversion") {
    val ev = Seq(
      // A completes the whole funnel in order
      ("a", "view", 1L), ("a", "click", 2L), ("a", "purchase", 3L),
      // B clicked BEFORE the first view: click must not count, and the
      // purchase (which needs an in-order click) must not either
      ("b", "click", 1L), ("b", "view", 2L), ("b", "purchase", 3L),
      // C only viewed
      ("c", "view", 5L)).toDF("user_id", "event_type", "ts")
    val t = Funnel.stageTimes(ev, "user_id", "event_type", "ts", stages)
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(t("a") == ((Some(1L), Some(2L), Some(3L))))
    assert(t("b") == ((Some(2L), None, None)), "out-of-order click dropped")
    assert(t("c") == ((Some(5L), None, None)))
    val s = Funnel.summary(
      Funnel.stageTimes(ev, "user_id", "event_type", "ts", stages), stages)
      .collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
      ((3L, 3L, 1L, 1L)))
  }

  test("stage times are strictly increasing: same-timestamp events do not chain") {
    // view and click at the same instant: the click is not AFTER the
    // view, so the funnel stops at view (strict > keeps replays and
    // batched duplicate timestamps from fabricating conversions)
    val ev = Seq(("u", "view", 7L), ("u", "click", 7L))
      .toDF("user_id", "event_type", "ts")
    val t = Funnel.stageTimes(ev, "user_id", "event_type", "ts", stages)
      .collect().head
    assert(t.getLong(1) == 7L && t.isNullAt(2) && t.isNullAt(3))
  }

  test("maxGap bounds the conversion window per stage transition") {
    val ev = Seq(
      ("u", "view", 10L), ("u", "click", 15L),   // within gap 5
      ("u", "purchase", 100L),                   // 85 after click -> outside
      ("v", "view", 10L), ("v", "click", 30L)    // 20 after view -> outside
    ).toDF("user_id", "event_type", "ts")
    val t = Funnel.stageTimes(ev, "user_id", "event_type", "ts", stages,
      maxGap = Some(5L)).collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3))))).toMap
    assert(t("u") == ((Some(10L), Some(15L), None)),
      "late purchase falls outside the click's window")
    assert(t("v") == ((Some(10L), None, None)),
      "late click falls outside the view's window")
    // and without a gap the same log converts fully for u
    val open = Funnel.stageTimes(ev, "user_id", "event_type", "ts", stages)
      .collect().map(r => r.getString(0) -> Option(r.get(3))).toMap
    assert(open("u").contains(100L))
  }

  test("repeat events pick the first valid occurrence per stage") {
    val ev = Seq(("u", "view", 1L), ("u", "view", 9L), ("u", "click", 4L),
      ("u", "click", 2L), ("u", "purchase", 5L))
      .toDF("user_id", "event_type", "ts")
    val t = Funnel.stageTimes(ev, "user_id", "event_type", "ts", stages)
      .collect().head
    // first view 1; first click after 1 is 2 (not 4); first purchase
    // after 2 is 5
    assert((t.getLong(1), t.getLong(2), t.getLong(3)) == ((1L, 2L, 5L)))
  }
}
