package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.model.EventsModel

/** Guards the events-fixture physical-type seam: the driver has shipped
  * `events.parquet#ts` both as TIMESTAMP(NANOS) (surfaced as BIGINT nanos
  * under `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
  * (surfaced as TIMESTAMP_NTZ). `Tables.eventTsNtz`/`eventTsMicros` must
  * read both generations to identical values, and everything downstream
  * (EventsModel, the stream lane) flows through them.
  */
class EventsTsSpec extends SparkSpec {

  // Same instants twice: micros since epoch (mid-Jan-2024, incl. a sub-ms
  // component to catch precision loss) written once as raw nanos BIGINT
  // and once as a micros TIMESTAMP_NTZ.
  private val micros = Seq(
    1704067200000000L,           // 2024-01-01T00:00:00
    1705276800123456L,           // 2024-01-15T00:00:00.123456
    1706486399999999L)           // 2024-01-28T23:59:59.999999

  private def writeFixtures(): (String, String) = {
    val s = spark
    import s.implicits._
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong + 1, i.toLong % 3, "view", 100.0 + i, """{"k": 2}""", us)
    }.toDF("event_id", "user_id", "event_type", "value", "props", "us")

    val nanosDir = tmpDir("ev_nanos")
    val microsDir = tmpDir("ev_micros")
    base.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    base.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    (nanosDir, microsDir)
  }

  test("eventTsNtz/eventTsMicros read nanos-long and micros-timestamp identically") {
    val (nanosDir, microsDir) = writeFixtures()
    val evN = Tables(spark, nanosDir, "events")
    val evM = Tables(spark, microsDir, "events")
    assert(evN.schema("ts").dataType == LongType, "nanos fixture reads as BIGINT")
    assert(evM.schema("ts").dataType.typeName == "timestamp_ntz",
      s"micros fixture reads as TIMESTAMP_NTZ, got ${evM.schema("ts").dataType}")

    val gotN = evN.select(col("event_id"), Tables.eventTsNtz(evN).as("ts"),
      Tables.eventTsMicros(evN).as("us")).orderBy("event_id").collect()
    val gotM = evM.select(col("event_id"), Tables.eventTsNtz(evM).as("ts"),
      Tables.eventTsMicros(evM).as("us")).orderBy("event_id").collect()
    assert(gotN.toSeq == gotM.toSeq)
    assert(gotN.map(_.getLong(2)).toSeq == micros, "exact micros, no precision loss")
  }

  test("EventsModel.rawEvents is physical-type independent") {
    val (nanosDir, microsDir) = writeFixtures()
    val a = EventsModel.rawEvents(spark, nanosDir).orderBy("event_id").collect()
    val b = EventsModel.rawEvents(spark, microsDir).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("rawEvents reads the driver fixture (current generation)") {
    val df = EventsModel.rawEvents(spark, sf())
    assert(df.schema("arrival_ts").dataType.typeName == "timestamp_ntz")
    assert(df.limit(5).count() > 0)
  }
}
