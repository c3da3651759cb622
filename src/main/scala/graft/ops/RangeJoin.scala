package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a cross product.
  *
  * Spark plans a raw `l.point BETWEEN r.lo AND r.hi` join as a broadcast
  * nested loop (or cartesian) — |L|×|R| comparisons. The scalable shape
  * bucketizes: every interval emits one row per fixed-width bin it
  * overlaps, every point computes its own bin, the join is an EQUI-join
  * on the bin, and the exact containment filter runs only on bin-local
  * candidates. Each (point, interval) pair appears at most once — the
  * point's own bin — so no post-join dedupe is needed. Pick `binWidth`
  * near the typical interval length: candidates per point are then the
  * intervals overlapping one bin, not all of |R|. */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame,
                      point: String, lo: String, hi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val rBinned = right.withColumn("_bin",
      explode(sequence(floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    val lBinned = left.withColumn("_bin",
      floor(col(point) / binWidth).cast("long"))
    lBinned.join(rBinned, Seq("_bin"))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_bin")
  }
}
