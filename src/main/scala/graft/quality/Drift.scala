package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between a reference and a current
  * population — the per-batch check a training-data pipeline runs so a
  * silently shifted upstream (new client version, changed sampler) is
  * caught before it poisons a training mix.
  *
  * Population Stability Index over a fixed histogram:
  *
  *   PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)
  *
  * with Laplace smoothing p = (c + 1) / (tot + nBins) so empty bins stay
  * finite, computed over the FULL bin spine (a bin empty on both sides
  * still contributes when the totals differ, keeping the sum
  * well-defined). Conventional reading: < 0.1 stable, 0.1–0.2 moderate,
  * > 0.2 action.
  *
  * Scale: the input collapses to (group × bin) counts in one map-side-
  * combined aggregation — everything after is census-sized (groups ×
  * nBins rows) joined against a broadcast-sized spine; nothing grows
  * with the row count. Determinism: probabilities are exact integer
  * ratios in fixed IEEE expressions; the one libm call (ln) is rounded
  * to 12 decimals and the per-bin terms are DECIMAL-summed (order-free).
  */
object Drift {

  /** PSI per group over pre-binned rows.
    *
    * @param binned   one row per observation with `groupCol` (grouping
    *                 key), `binCol` (int bin id in [0, nBins)), and
    *                 `isRefCol` (1 = reference population, 0 = current)
    * @param nBins    fixed histogram width; bin ids outside [0, nBins)
    *                 are counted but never spine-filled, so produce them
    *                 clamped (e.g. `least(floor(v / w), nBins − 1)`)
    * @param threshold PSI at or above which `drifted` is flagged
    * @return one row per group: group, n_ref, n_cur, psi, drifted
    */
  def psi(binned: DataFrame, groupCol: String, binCol: String,
          isRefCol: String, nBins: Int, threshold: Double = 0.1): DataFrame = {
    val counts = binned.groupBy(groupCol, binCol).agg(
      sum(col(isRefCol)).cast("long").as("c_ref"),
      sum(lit(1) - col(isRefCol)).cast("long").as("c_cur"))
    psiFromCounts(counts, groupCol, binCol, nBins, threshold)
  }

  /** PSI per group over a pre-counted histogram table with `c_ref` /
    * `c_cur` long columns — cells may be missing (spine-filled to 0),
    * and a group present on only one side still scores. This is the
    * merge point for precomputed references: a 100 TB deployment stores
    * the reference histogram once (census-sized: groups × bins) and
    * every later batch joins against it instead of rescanning the
    * reference population. */
  def psiFromCounts(counts: DataFrame, groupCol: String, binCol: String,
                    nBins: Int, threshold: Double): DataFrame = {
    val s = counts.sparkSession
    val spine = counts.select(groupCol).distinct()
      .crossJoin(s.range(0, nBins).select(col("id").cast("int").as(binCol)))
    val full = spine.join(counts, Seq(groupCol, binCol), "left")
      .na.fill(0L, Seq("c_ref", "c_cur"))
    val wt = Window.partitionBy(groupCol)
    val terms = full
      .withColumn("tot_ref", sum(col("c_ref")).over(wt))
      .withColumn("tot_cur", sum(col("c_cur")).over(wt))
      .withColumn("p_ref", (col("c_ref") + 1) / (col("tot_ref") + nBins.toDouble))
      .withColumn("p_cur", (col("c_cur") + 1) / (col("tot_cur") + nBins.toDouble))
      .withColumn("term",
        (col("p_cur") - col("p_ref")) * round(log(col("p_cur") / col("p_ref")), 12))
    terms.groupBy(groupCol, "tot_ref", "tot_cur").agg(
        sum(col("term").cast("decimal(27,12)")).cast("double").as("psi"))
      .select(col(groupCol), col("tot_ref").as("n_ref"),
        col("tot_cur").as("n_cur"), col("psi"),
        (col("psi") >= threshold).as("drifted"))
  }

  /** Publish the reference histogram from a trusted population — the
    * census-sized (group, bin, c_ref) table a deployment persists once
    * and every later [[scoreBatch]] call joins against. */
  def referenceCounts(binned: DataFrame, groupCol: String,
                      binCol: String): DataFrame =
    binned.groupBy(groupCol, binCol)
      .agg(count(lit(1)).cast("long").as("c_ref"))

  /** Streaming attachment (call from `foreachBatch`): score ONE
    * microbatch's binned observations against a precomputed reference
    * count table `refCounts` (groupCol, binCol, c_ref) and return the
    * per-group PSI rows stamped with the batch id — append them to a
    * metrics table and alert on `drifted`. The reference is static and
    * census-sized, so each microbatch costs one map-side-combined count
    * of itself plus a broadcast-sized join. */
  def scoreBatch(batchBinned: DataFrame, refCounts: DataFrame,
                 groupCol: String, binCol: String, nBins: Int,
                 threshold: Double, batchId: Long): DataFrame = {
    val cur = batchBinned.groupBy(groupCol, binCol)
      .agg(count(lit(1)).cast("long").as("c_cur"))
    val counts = refCounts.join(cur, Seq(groupCol, binCol), "full_outer")
      .na.fill(0L, Seq("c_ref", "c_cur"))
    psiFromCounts(counts, groupCol, binCol, nBins, threshold)
      .withColumn("batch_id", lit(batchId))
  }
}
