package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §A).
  *
  * One parquet file per table under `sfDir`. All timestamps are read in the
  * session time zone (pinned UTC by Verify/Bench/tests) so values agree with
  * the DuckDB oracle, which treats them as naive UTC.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
