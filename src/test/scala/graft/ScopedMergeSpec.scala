package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.SnapshotTable
import graft.stream.HourLoad

/** scopedMerge partition-scope encoding: the staged partition values must
  * match the hive dir encoding for EVERY key type, or the merge reads an
  * empty target and the partition overwrite silently drops existing rows. */
class ScopedMergeSpec extends SparkSpec {

  private def mkTable(partField: StructField) = {
    val schema = StructType(Seq(
      StructField("trip_id", LongType), partField, StructField("v", StringType)))
    SnapshotTable(spark, tmpDir("scoped_merge"), schema, Seq(partField.name))
  }

  test("TIMESTAMP partition key: existing unmatched rows in the touched partition survive") {
    // java.sql.Timestamp.toString renders '2024-01-01 00:00:00.0' — never a
    // hive dir value — so a toString-scoped merge would read an empty target
    val t = mkTable(StructField("pk", TimestampType))
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val s = spark
    import s.implicits._
    val existing = Seq((1L, ts, "old1"), (2L, ts, "old2")).toDF("trip_id", "pk", "v")
    t.append(existing)
    val staged = Seq((2L, ts, "new2"), (3L, ts, "new3")).toDF("trip_id", "pk", "v")
    val (ins, upd) = HourLoad.scopedMerge(t, staged, "pk")
    assert((ins, upd) == (1L, 1L), s"row 3 inserts, row 2 updates: got ($ins, $upd)")
    val rows = t.read.orderBy("trip_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toSeq
    assert(rows == Seq(1L -> "old1", 2L -> "new2", 3L -> "new3"),
      s"unmatched existing row 1 survives the merge: $rows")
  }

  test("DATE and INT partition keys keep the same merge semantics") {
    val td = mkTable(StructField("pk", DateType))
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val s = spark
    import s.implicits._
    td.append(Seq((1L, d0, "old")).toDF("trip_id", "pk", "v"))
    val (i1, u1) = HourLoad.scopedMerge(td,
      Seq((2L, d0, "new")).toDF("trip_id", "pk", "v"), "pk")
    assert((i1, u1) == (1L, 0L) && td.read.count() == 2)

    val ti = mkTable(StructField("pk", IntegerType))
    ti.append(Seq((1L, 20240101, "old")).toDF("trip_id", "pk", "v")
      .select(col("trip_id"), col("pk").cast("int"), col("v")))
    val (i2, u2) = HourLoad.scopedMerge(ti,
      Seq((1L, 20240101, "new")).toDF("trip_id", "pk", "v")
        .select(col("trip_id"), col("pk").cast("int"), col("v")), "pk")
    assert((i2, u2) == (0L, 1L) && ti.read.count() == 1)
  }

  test("untouched partitions are never read or rewritten") {
    val t = mkTable(StructField("pk", DateType))
    val s = spark
    import s.implicits._
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    t.append(Seq((1L, d1, "p1"), (2L, d2, "p2")).toDF("trip_id", "pk", "v"))
    HourLoad.scopedMerge(t,
      Seq((3L, d1, "p1new")).toDF("trip_id", "pk", "v"), "pk")
    val rows = t.read.collect().map(r => r.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L), s"partition d2 untouched and intact: $rows")
  }
}
