package graft

import graft.ops.ResultDiff
import java.nio.file.{Files, Paths}

/** The row-level mismatch artifact: a forced mismatch must produce a
  * `_diff.txt` with hex-bit tuples, and bit-identical frames must not. */
class ResultDiffSpec extends SparkSpec {

  import spark.implicits._

  test("forced float mismatch writes the diff dump with IEEE-754 hex bits") {
    val exp = Seq(("a", 1.5), ("b", 0.1 + 0.2)).toDF("k", "v")
    val act = Seq(("a", 1.5), ("b", 0.3)).toDF("k", "v") // 0.1+0.2 != 0.3 bitwise
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_diff_${System.nanoTime()}", "forced_diff.txt")
    val ds = ResultDiff.dump(exp, act, path)
    assert(ds.nonEmpty, "0.1+0.2 vs 0.3 differs at the bit level")
    assert(ds.head.kind == "TOL",
      "within 1e-9 tolerance but NOT bit-identical — the driver-hash hazard class")
    assert(ds.head.col == "v" && ds.head.row == 1)
    val txt = Files.readString(path)
    assert(txt.contains("3fd3333333333334") && txt.contains("3fd3333333333333"),
      s"both sides' raw bit patterns are in the artifact:\n$txt")
  }

  test("hard mismatch, null asymmetry, and shape mismatches are classified") {
    val exp = Seq(("a", java.lang.Double.valueOf(1.0)),
      ("b", null.asInstanceOf[java.lang.Double])).toDF("k", "v")
    val hard = Seq(("a", java.lang.Double.valueOf(2.0)),
      ("b", null.asInstanceOf[java.lang.Double])).toDF("k", "v")
    assert(ResultDiff.diff(exp, hard).head.kind == "HARD")
    val nul = Seq(("a", java.lang.Double.valueOf(1.0)),
      ("b", java.lang.Double.valueOf(9.0))).toDF("k", "v")
    assert(ResultDiff.diff(exp, nul).exists(d => d.kind == "HARD" && d.row == 1))
    val fewer = Seq(("a", 1.0)).toDF("k", "v")
    assert(ResultDiff.diff(exp, fewer).head.col == "_rowcount")
    val renamed = exp.withColumnRenamed("v", "w")
    assert(ResultDiff.diff(exp, renamed).head.col == "_columns")
  }

  test("bit-identical frames produce no diffs and no file") {
    val exp = Seq(("a", 1.0 / 3.0), ("b", math.sqrt(2.0))).toDF("k", "v")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_diff_${System.nanoTime()}", "no_diff.txt")
    assert(ResultDiff.dump(exp, exp, path).isEmpty)
    assert(!Files.exists(path), "no artifact for a clean compare")
  }
}
