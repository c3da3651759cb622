package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Sha256Prefix64Util
import graft.model.TaxiModel
import org.apache.spark.unsafe.types.UTF8String

/** Property tests (SURVEY §5 test plan): dedupe idempotence, merge
  * idempotence, hash determinism/stability. */
class PropertySpec extends SparkSpec {

  /** Minimal forAll: deterministic sampling of a Gen (scalatestplus is not
    * in the offline cache; raw ScalaCheck is). */
  private def forAll[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  test("dedupe is idempotent on the fixture corpus: dedupe(dedupe(x)) == dedupe(x)") {
    val cleaned = TaxiModel.cleaned(TaxiModel.tripsWithDups(spark, sf()),
      TaxiModel.paymentTypeMap(spark))
    val once = TaxiModel.deduped(cleaned)
    val twice = TaxiModel.deduped(once)
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    // no duplicate natural keys remain
    assert(once.groupBy(TaxiModel.naturalKey.map(col): _*).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("stream merge is idempotent: applying the same slice twice == once") {
    import graft.stream.StreamTransforms
    val routed = graft.model.EventsModel.routed(spark, sf())
    val slice = StreamTransforms.buildSlice(routed, lit("r")).drop("_runId")
      .select("trip_id", "fare_amount", "total_amount")
    val empty = slice.filter(lit(false))
    val once = StreamTransforms.mergeByTripId(empty, slice,
      Seq("fare_amount", "total_amount")).drop("merge_action")
    val twice = StreamTransforms.mergeByTripId(once, slice,
      Seq("fare_amount", "total_amount")).drop("merge_action")
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).isEmpty)
  }

  test("hash64 is deterministic, non-negative, and spread (ScalaCheck)") {
    forAll(Gen.asciiPrintableStr) { (s: String) =>
      val a = Sha256Prefix64Util.hash64(UTF8String.fromString(s))
      val b = Sha256Prefix64Util.hash64(UTF8String.fromString(s))
      assert(a == b && a >= 0)
    }
    // distinct inputs rarely collide (smoke spread check)
    val hs = (1 to 1000).map(i => Sha256Prefix64Util.hash64(
      UTF8String.fromString(s"key-$i")))
    assert(hs.distinct.size == 1000)
  }

  test("miles→km round conversion stays within half-milli tolerance") {
    forAll(Gen.chooseNum(0.0, 1000.0)) { (mi: Double) =>
      val km = BigDecimal(mi * 1.609344)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(km / 1.609344 - mi) <= 0.0005 / 1.609344 + 1e-9)
    }
  }
}
