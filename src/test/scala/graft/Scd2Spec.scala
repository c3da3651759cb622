package graft

import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** SCD2 history assembly on a hand-checkable change log. */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  test("collapses no-change rows, stamps [from, to) validity + is_current") {
    val log = Seq(
      (1L, 10L, 1L, Some("bronze")),
      (1L, 20L, 2L, Some("bronze")), // no change — collapsed
      (1L, 30L, 3L, Some("silver")),
      (1L, 40L, 4L, None),           // NULL is a legitimate version
      (1L, 50L, 5L, None),           // no change (null == null) — collapsed
      (1L, 60L, 6L, Some("gold")),
      (2L, 15L, 7L, Some("bronze"))) // other key, independent history
      .toDF("user_id", "ts_us", "event_id", "tier")
    val hist = Scd2.fromChangeLog(log, Seq("user_id"),
        Seq("ts_us", "event_id"), Seq("tier"), "ts_us")
      .select("user_id", "tier", "effective_from", "effective_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .sortBy(v => (v._1, v._3))
    assert(hist.toSeq == Seq(
      (1L, Some("bronze"), 10L, Some(30L), false),
      (1L, Some("silver"), 30L, Some(40L), false),
      (1L, None, 40L, Some(60L), false),
      (1L, Some("gold"), 60L, None, true),
      (2L, Some("bronze"), 15L, None, true)))
  }

  test("validity ranges tile each key's timeline with no gaps or overlaps") {
    val log = (1 to 500).map { i =>
      (i % 7L, i * 10L, i.toLong, s"v${i % 3}")
    }.toDF("k", "ts_us", "event_id", "attr")
    val hist = Scd2.fromChangeLog(log, Seq("k"),
        Seq("ts_us", "event_id"), Seq("attr"), "ts_us")
      .select("k", "effective_from", "effective_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
      .groupBy(_._1)
    hist.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.init.zip(sorted.tail).forall {
        case (a, b) => a._3.contains(b._2) }, s"key $k: to == next from")
      assert(sorted.last._3.isEmpty && sorted.last._4, s"key $k: open current row")
      assert(sorted.init.forall(!_._4), s"key $k: only the last row is current")
    }
  }
}
