package graft.perf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping
  * (SURVEY §4; the lake-layout technique behind Delta/Iceberg `ZORDER BY`,
  * Morton 1966). Sorting by the bit-interleaved z-value keeps rows that
  * are close in BOTH dimensions inside the same file, so per-file min/max
  * statistics prune scans filtered on EITHER dimension — a single-column
  * sort gives perfect pruning on one axis and none on the other.
  *
  * The z-value is a pure integer projection (16 shift/mask terms at 8
  * bits/dim — all inside whole-stage codegen); the cluster step is the
  * `repartitionByRange(zval)` + sortWithinPartitions any layout rewrite
  * already pays. Nothing here floats, so the declared query is
  * oracle-exact. */
object ZOrder {

  /** Bit-interleaved Morton code of two non-negative ints truncated to
    * `bits` bits each: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Monotone in the interleaved locality order; collisions beyond
    * `bits` bits are fine for clustering (ties just stay adjacent). */
  def zValue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _).cast("long")

  /** The same Morton code as a DuckDB SQL expression over column exprs
    * `x`/`y` — generated from the same loop so the engines cannot drift. */
  def zValueSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("CAST(", " + ", " AS BIGINT)")
}
