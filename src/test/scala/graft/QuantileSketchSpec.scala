package graft

import graft.ops.QuantileSketch

/** Histogram-quantile estimation on hand-countable distributions. */
class QuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  test("interpolated median on a known histogram; error bounded by one bin") {
    // group a: 1..100 uniform → median ≈ 50; bins of 10 over [0, 100)
    // group b: all mass in one bin → est inside that bin
    val df = ((1 to 100).map(v => ("a", v.toDouble)) ++
      (1 to 10).map(_ => ("b", 42.0))).toDF("g", "v")
    val got = QuantileSketch.estimate(df, Seq("g"), "v", 0.0, 100.0, 10, 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("a")._1 == 100L && got("b")._1 == 10L)
    // bins [40,50) hold values 40..49 → cum 49 < target 50; the median
    // bin is [50,60) with cumBefore 49: est = 50 + 10·(50−49)/10 = 51
    assert(got("a")._2 == 51.0, s"uniform median interpolates exactly: $got")
    // b: all 10 values in [40,50), target 5 → 40 + 10·(5−0)/10 = 45
    assert(got("b")._2 == 45.0, "point mass interpolates to its bin midpoint")
    // exact medians: a = 50.5, b = 42 → both within one bin width
    assert(math.abs(got("a")._2 - 50.5) <= 10.0 && math.abs(got("b")._2 - 42.0) <= 10.0)
  }

  test("out-of-domain values clamp into edge bins and still count") {
    val df = Seq(("g", -5.0), ("g", 1.0), ("g", 999.0)).toDF("g", "v")
    val got = QuantileSketch.estimate(df, Seq("g"), "v", 0.0, 10.0, 5, 0.5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(got._1 == 3L, "clamped rows are not dropped")
    // median rank 1.5 lands in bin 0 (the clamped -5 plus 1.0 live there)
    assert(got._2 >= 0.0 && got._2 < 2.0, s"$got")
  }
}
