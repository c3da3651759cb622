package graft

import graft.quality.Drift

/** PSI drift detection on hand-computed histograms. */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  private def round12(x: Double) =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fully swapped two-bin distribution matches the hand-computed PSI") {
    // ref: both rows in bin 0; cur: both rows in bin 1. With Laplace
    // smoothing over 2 bins: p_ref = (3/4, 1/4), p_cur = (1/4, 3/4).
    // term_0 = (1/4 − 3/4)·ln(1/3), term_1 = (3/4 − 1/4)·ln(3)
    //        → PSI = 2 · 0.5 · ln 3 ≈ 1.0986 — far beyond "action".
    val rows = Seq(("g", 0, 1), ("g", 0, 1), ("g", 1, 0), ("g", 1, 0))
      .toDF("g", "bin", "is_ref")
    val got = Drift.psi(rows, "g", "bin", "is_ref", 2).collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == 2L)
    val expected = -0.5 * round12(math.log(1.0 / 3.0)) + 0.5 * round12(math.log(3.0))
    assert(math.abs(got.getDouble(3) - expected) < 1e-12, s"psi: $got")
    assert(got.getBoolean(4), "a fully swapped distribution must flag drift")
  }

  test("identical distributions have PSI 0 even with empty and unseen bins") {
    // Same histogram both sides (bin 3 of 4 never observed): every
    // p_cur equals p_ref, each ln ratio is 0, and the spine-filled empty
    // bin contributes 0 too because the totals match.
    val rows = Seq(("g", 0, 1), ("g", 0, 0), ("g", 1, 1), ("g", 1, 0),
      ("g", 2, 1), ("g", 2, 0)).toDF("g", "bin", "is_ref")
    val got = Drift.psi(rows, "g", "bin", "is_ref", 4).collect().head
    assert(got.getDouble(3) == 0.0 && !got.getBoolean(4), s"$got")
  }

  test("scoreBatch against a stored reference equals psi() over the union") {
    val ref = Drift.referenceCounts(
      Seq(("g", 0), ("g", 0), ("g", 1), ("g", 1)).toDF("g", "bin"), "g", "bin")
    val batch = Seq(("g", 1), ("g", 1), ("g", 1), ("g", 0)).toDF("g", "bin")
    val got = Drift.scoreBatch(batch, ref, "g", "bin", 4, 0.1, batchId = 7L)
      .collect().head
    // identical computation phrased as one frame with is_ref
    val union = Seq(("g", 0, 1), ("g", 0, 1), ("g", 1, 1), ("g", 1, 1),
      ("g", 1, 0), ("g", 1, 0), ("g", 1, 0), ("g", 0, 0))
      .toDF("g", "bin", "is_ref")
    val want = Drift.psi(union, "g", "bin", "is_ref", 4).collect().head
    assert(got.getDouble(3) == want.getDouble(3), s"$got vs $want")
    assert(got.getLong(5) == 7L, "metrics row carries the batch id")
  }

  test("foreachBatch drift monitor appends one scored row per microbatch group") {
    import org.apache.spark.sql.streaming.Trigger
    val in = tmpDir("graft_drift_in")
    val metrics = tmpDir("graft_drift_out")
    Seq(("a", 0), ("a", 0), ("a", 1)).toDF("g", "bin")
      .write.mode("overwrite").parquet(in)
    val ref = Seq(("a", 0, 1L), ("a", 1, 1L)).toDF("g", "bin", "c_ref")
    val q = spark.readStream
      .schema("g STRING, bin INT").parquet(in)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        Drift.scoreBatch(df, ref, "g", "bin", 2, 0.1, id)
          .write.mode("append").parquet(metrics)
      }.trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "monitor stream finished in time")
    assert(q.exception.isEmpty, s"monitor stream clean: ${q.exception}")
    val rows = spark.read.parquet(metrics).collect()
    assert(rows.length == 1, s"one group scored once: ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[String]("g") == "a" && r.getAs[Long]("n_cur") == 3L)
  }

  test("groups are scored independently") {
    val rows = Seq(("stable", 0, 1), ("stable", 0, 0),
      ("moved", 0, 1), ("moved", 1, 0)).toDF("g", "bin", "is_ref")
    val got = Drift.psi(rows, "g", "bin", "is_ref", 2, threshold = 0.2)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got("stable")._1 == 0.0 && !got("stable")._2)
    assert(got("moved")._1 > 0.2 && got("moved")._2, s"$got")
  }
}
