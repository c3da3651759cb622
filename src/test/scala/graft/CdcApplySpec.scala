package graft

import graft.ops.CdcApply

/** CDC change-feed application on a hand-checkable log. */
class CdcApplySpec extends SparkSpec {

  import spark.implicits._

  test("last writer wins: updates apply, deletes remove, reinserts-after-delete survive") {
    val snapshot = Seq(
      (1L, "bronze", 1.0),  // updated by the feed
      (2L, "silver", 2.0),  // deleted
      (3L, "gold", 3.0),    // untouched
      (4L, "iron", 4.0))    // deleted then reinserted
      .toDF("user_id", "tier", "score")
    val changes = Seq(
      (1L, "U", 10L, 1L, "bronze+", 1.5),
      (1L, "U", 20L, 2L, "platinum", 9.9), // later → wins
      (2L, "D", 15L, 3L, null, 0.0),
      (4L, "D", 30L, 4L, null, 0.0),
      (4L, "I", 40L, 5L, "iron2", 4.5),    // reinsert AFTER the delete → lives
      (5L, "I", 50L, 6L, "new", 5.0),      // brand-new key
      (5L, "I", 50L, 7L, "newer", 5.5))    // same ts — seq breaks the tie
      .toDF("user_id", "op", "ts_us", "seq", "tier", "score")
    val got = CdcApply(snapshot, changes, Seq("user_id"), Seq("ts_us", "seq"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> (("platinum", 9.9)),
      3L -> (("gold", 3.0)),
      4L -> (("iron2", 4.5)),
      5L -> (("newer", 5.5))), s"got $got")
  }

  test("delete AFTER a reinsert removes the key — order decides, not op") {
    val snapshot = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "I", 10L, "b"), (1L, "D", 20L, null))
      .toDF("k", "op", "ts", "v")
    assert(CdcApply(snapshot, changes, Seq("k"), Seq("ts")).count() == 0)
  }

  test("empty feed is identity; replayed feed is idempotent") {
    val snapshot = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((2L, "U", 10L, "b2")).toDF("k", "op", "ts", "v")
    val once = CdcApply(snapshot, changes, Seq("k"), Seq("ts"))
    val twice = CdcApply(once, changes, Seq("k"), Seq("ts"))
    assert(once.collect().map(_.toString).sorted.toSeq ==
      twice.collect().map(_.toString).sorted.toSeq, "re-applying the feed is a no-op")
    val none = CdcApply(snapshot, changes.limit(0), Seq("k"), Seq("ts"))
    assert(none.collect().map(_.toString).sorted.toSeq ==
      snapshot.collect().map(_.toString).sorted.toSeq)
  }
}
