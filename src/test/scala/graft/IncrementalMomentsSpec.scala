package graft

import graft.ops.{IncrementalMoments, ParquetTable}

/** merge(partials(A), partials(B)) must equal partials(A ∪ B) exactly,
  * including through a persisted state table round trip. */
class IncrementalMomentsSpec extends SparkSpec {

  import spark.implicits._

  private val keys = Seq("k")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    IncrementalMoments.finalized(df)
      .orderBy("k").collect().map(_.toSeq).toSeq

  test("merging batch partials equals the full recompute, bit for bit") {
    val a = Seq(("p", 10L), ("p", 20L), ("q", 7L)).toDF("k", "x")
    val b = Seq(("p", 30L), ("r", 1L), ("q", 7L)).toDF("k", "x")
    val merged = IncrementalMoments.merge(
      Seq(IncrementalMoments.partials(a, keys, "x"),
        IncrementalMoments.partials(b, keys, "x")), keys)
    val full = IncrementalMoments.partials(a.unionByName(b), keys, "x")
    assert(canon(merged) == canon(full))
    // spot-check the finalized values are the hand-computed ones
    val p = IncrementalMoments.finalized(merged).filter($"k" === "p")
      .select("n", "sx", "mean", "variance").collect().head
    assert(p.getLong(0) == 3L && p.getLong(1) == 60L)
    assert(p.getDouble(2) == 20.0)
    // population variance of {10,20,30} = ((100+400+900)/3) - 400 = 66.66…
    assert(math.abs(p.getDouble(3) - 200.0 / 3.0) < 1e-12)
  }

  test("state survives a ParquetTable round trip and a later merge") {
    val dir = tmpDir("graft_moments_state")
    val day1 = Seq(("en", 100L), ("en", 200L), ("de", 50L)).toDF("k", "x")
    val state0 = IncrementalMoments.partials(day1, keys, "x")
    val table = ParquetTable(spark, s"$dir/state", state0.schema)
    table.overwrite(state0)

    val day2 = Seq(("en", 300L), ("fr", 9L)).toDF("k", "x")
    val state1 = IncrementalMoments.merge(
      Seq(table.read, IncrementalMoments.partials(day2, keys, "x")), keys)
    table.overwrite(state1)

    val full = IncrementalMoments.partials(day1.unionByName(day2), keys, "x")
    assert(canon(table.read) == canon(full),
      "persisted incremental state equals the from-scratch stats")
  }

  test("merge is associative: (A+B)+C equals A+(B+C)") {
    def p(rows: (String, Long)*) =
      IncrementalMoments.partials(rows.toSeq.toDF("k", "x"), keys, "x")
    val (a, b, c) = (p("g" -> 1L, "g" -> 2L), p("g" -> 3L), p("h" -> 4L))
    val left = IncrementalMoments.merge(
      Seq(IncrementalMoments.merge(Seq(a, b), keys), c), keys)
    val right = IncrementalMoments.merge(
      Seq(a, IncrementalMoments.merge(Seq(b, c), keys)), keys)
    assert(canon(left) == canon(right))
  }
}
