package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental statistics maintenance over an integral measure: the
  * algebraic (mergeable) moments pattern behind keeping per-key corpus
  * stats current WITHOUT rescanning the corpus. A batch collapses to one
  * partial row per key (`n`, Σx, Σx², min, max); partial rows merge by
  * plain sums/mins/maxes; means and variances derive only at read time.
  *
  * All partial fields are exact: counts and Σx are integer sums, Σx² is
  * DECIMAL(38,0) (overflow-safe at 100 TB where a BIGINT square-sum is
  * not), so merge order never changes a bit and
  * merge(partials(A), partials(B)) ≡ partials(A ∪ B) exactly — the
  * property IncrementalMomentsSpec pins and the `agg_merge_moments`
  * declared query proves against the DuckDB oracle end-to-end.
  *
  * Scale: each call is one map-side-combined aggregation over its input;
  * the state table is key-census-sized. A daily deployment stores the
  * state with [[ParquetTable]] and merges each new batch's partials in —
  * the write pattern `Runner` already uses for its warehouse tables.
  */
object IncrementalMoments {

  private val fields = Seq("n", "sx", "sxx", "mn", "mx")

  /** One partial-stats row per key over integral column `x`. */
  def partials(df: DataFrame, keys: Seq[String], x: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(x).cast("long")).as("sx"),
      sum((col(x).cast("long") * col(x).cast("long")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("sxx"),
      min(col(x).cast("long")).as("mn"),
      max(col(x).cast("long")).as("mx"))

  /** Merge any number of partial-stats frames (e.g. the standing state
    * plus a new batch's partials) into one row per key. Associative and
    * commutative — every field is a sum, min, or max of exact values. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state frame")
    states.map(_.select((keys ++ fields).map(col): _*))
      .reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sx")).as("sx"),
        sum(col("sxx")).cast("decimal(38,0)").as("sxx"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
  }

  /** Read-time finalization: mean and population variance from the exact
    * partials (fixed IEEE expressions — deterministic across engines). */
  def finalized(state: DataFrame): DataFrame =
    state
      .withColumn("mean", col("sx").cast("double") / col("n"))
      .withColumn("variance",
        col("sxx").cast("double") / col("n") - col("mean") * col("mean"))
}
