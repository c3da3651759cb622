package graft.ops

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths, Path}

/** Row-level mismatch dump — the Scala twin of `tools/oracle_check.py`'s
  * `<query>_diff.txt` artifact. Compares two (small, already-ordered)
  * result frames column-by-column after sorting column names — the same
  * canonicalization the driver's hash compare applies — and writes the
  * first `maxDiffs` differing tuples as
  * `kind\tcol\trow\texpected\tactual\texpected_hexbits\tactual_hexbits`.
  *
  * `hexbits` is the raw IEEE-754 bit pattern (`Double.doubleToRawLongBits`
  * big-endian hex) of each side when the value is a non-NaN floating
  * value, `-` otherwise: a last-ulp divergence between this engine and a
  * foreign oracle build is visible from the dump alone, which a decimal
  * rendering can hide (two doubles can print identically at the default
  * precision and still hash differently).
  *
  * Kinds: `HARD` = values differ beyond 1e-9 relative tolerance (or are
  * non-float and unequal), `TOL` = floats within tolerance but NOT
  * bit-identical — the case the driver's exact-hash gate still fails on.
  *
  * Diagnostic tool for bounded verify outputs (every oracle query returns
  * a small frame) — it collects both sides to the driver; do not point it
  * at an unbounded production result. */
object ResultDiff {

  final case class Diff(kind: String, col: String, row: Int,
                        expected: Any, actual: Any)

  private def hexbits(v: Any): String = v match {
    case d: java.lang.Double if !d.isNaN =>
      f"${java.lang.Double.doubleToRawLongBits(d)}%016x"
    case f: java.lang.Float if !f.isNaN =>
      f"${java.lang.Float.floatToRawIntBits(f)}%08x"
    case _ => "-"
  }

  private def isNullish(v: Any): Boolean = v match {
    case null => true
    case d: java.lang.Double => d.isNaN
    case f: java.lang.Float  => f.isNaN
    case _ => false
  }

  /** All non-bit-identical cells between `expected` and `actual`, in
    * sorted-column then row order, capped at `maxDiffs`. Row counts must
    * match upstream (a rowcount mismatch is reported as one synthetic
    * diff on the pseudo-column `_rowcount`). */
  def diff(expected: DataFrame, actual: DataFrame,
           maxDiffs: Int = 20): Seq[Diff] = {
    val cols = expected.columns.sorted.toSeq
    if (cols != actual.columns.sorted.toSeq)
      return Seq(Diff("HARD", "_columns", 0,
        cols.mkString(","), actual.columns.sorted.mkString(",")))
    val e = expected.select(cols.map(expected(_)): _*).collect()
    val a = actual.select(cols.map(actual(_)): _*).collect()
    if (e.length != a.length)
      return Seq(Diff("HARD", "_rowcount", 0, e.length, a.length))
    val out = scala.collection.mutable.ArrayBuffer.empty[Diff]
    var ci = 0
    while (ci < cols.length && out.length < maxDiffs) {
      var ri = 0
      while (ri < e.length && out.length < maxDiffs) {
        val ev = e(ri).get(ci)
        val av = a(ri).get(ci)
        val en = isNullish(ev); val an = isNullish(av)
        if (!(en && an)) {
          if (en != an) out += Diff("HARD", cols(ci), ri, ev, av)
          else (ev, av) match {
            case (x: java.lang.Double, y: java.lang.Double) =>
              if (x.doubleValue != y.doubleValue ||
                  java.lang.Double.doubleToRawLongBits(x) !=
                  java.lang.Double.doubleToRawLongBits(y)) {
                val kind =
                  if (math.abs(x - y) <=
                      1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y))))
                    "TOL" else "HARD"
                out += Diff(kind, cols(ci), ri, ev, av)
              }
            case (x, y) =>
              if (x != y) out += Diff("HARD", cols(ci), ri, ev, av)
          }
        }
        ri += 1
      }
      ci += 1
    }
    out.toSeq
  }

  /** Diff + write the artifact. Returns the diffs; writes nothing when
    * the frames are bit-identical. */
  def dump(expected: DataFrame, actual: DataFrame, path: Path,
           maxDiffs: Int = 20): Seq[Diff] = {
    val ds = diff(expected, actual, maxDiffs)
    if (ds.nonEmpty) {
      val sb = new StringBuilder(
        "kind\tcol\trow\texpected\tactual\texpected_hexbits\tactual_hexbits\n")
      ds.foreach { d =>
        sb.append(s"${d.kind}\t${d.col}\t${d.row}\t${d.expected}\t${d.actual}" +
          s"\t${hexbits(d.expected)}\t${hexbits(d.actual)}\n")
      }
      Files.createDirectories(path.getParent)
      Files.writeString(path, sb.toString)
    }
    ds
  }
}
