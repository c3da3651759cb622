package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Additive schema evolution on the staging read path (reference:
  * stg_trip.sql:38-111 — per-column ALTER TABLE ADD IF NOT EXISTS; SURVEY
  * §1.2 maps it to mergeSchema). Old-generation rows must surface NULL for
  * columns that later generations added, and the explicit cast projection
  * must pin canonical types regardless of source file. */
class SchemaDriftSpec extends SparkSpec {

  import spark.implicits._

  test("mergeSchema read: old rows surface NULL for late-added columns") {
    val out = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(out)
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v", "score")
      .write.mode(SaveMode.Append).parquet(out)
    val back = spark.read.option("mergeSchema", "true").parquet(out)
    assert(back.schema.fieldNames.toSet == Set("id", "v", "score"),
      s"union schema expected: ${back.schema.treeString}")
    val rows = back.orderBy("id")
      .select(col("id"), col("score")).collect()
    assert(rows.take(2).forall(_.isNullAt(1)), "gen-1 rows read NULL score")
    assert(rows.drop(2).map(_.getDouble(1)).toSeq == Seq(30.0, 40.0),
      "gen-2 rows keep their values")
  }

  test("scan_parquet_evolve: NULL pattern follows the generation split") {
    val got = SparkEntry.queries("scan_parquet_evolve")(spark, sf())
    // disc/flag came only with generation 2 (l_orderkey % 4 == 0)
    val bad = got.filter(
      (col("l_orderkey") % 4 === 0 && (col("disc").isNull || col("flag").isNull)) ||
      (col("l_orderkey") % 4 =!= 0 && (col("disc").isNotNull || col("flag").isNotNull)))
    assert(bad.isEmpty, "NULLs must appear exactly on pre-drift rows")
    // the cast projection pins canonical types
    assert(got.schema("qty").dataType.typeName == "double" &&
      got.schema("line_no").dataType.typeName == "integer")
  }
}
