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

  test("vec_dot/vec_dist_sq match the interpreted definition on random vectors") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    forAll(Gen.zip(genVec, genVec), n = 200) { case (a, b) =>
      val exp = a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      val expD = a.zip(b).foldLeft(0.0) { (s, p) =>
        val d = p._1.toDouble - p._2.toDouble; s + d * d
      }
      import org.apache.spark.sql.catalyst.util.ArrayData
      val xa = ArrayData.toArrayData(a.toArray)
      val xb = ArrayData.toArrayData(b.toArray)
      // interpreted eval path, bit-for-bit (left-to-right double sums)
      val one = org.apache.spark.sql.graft.Bridge.expression(lit(1))
      val dot = graft.functions.FloatVecDot(one, one)
        .nullSafeEval(xa, xb).asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(dot) ==
        java.lang.Double.doubleToLongBits(exp))
      val dsq = graft.functions.VecDistSq(one, one)
        .nullSafeEval(xa, ArrayData.toArrayData(b.map(_.toDouble).toArray))
        .asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(dsq) ==
        java.lang.Double.doubleToLongBits(expD))
    }
    // codegen path agrees with interpreted on a sampled frame
    import spark.implicits._
    val rows = (1 to 50).map { i =>
      (Array.tabulate(8)(j => (i * 31 + j * 7 % 13).toFloat / 3f),
        Array.tabulate(8)(j => (i * 17 + j * 5 % 11).toFloat / 7f))
    }.toDF("a", "b")
    val viaCodegen = rows.select(graft.functions.FloatVecDot.dot(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val viaEval = rows.collect().map { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
    }
    assert(java.util.Arrays.equals(
      viaCodegen.map(java.lang.Double.doubleToLongBits),
      viaEval.map(java.lang.Double.doubleToLongBits)))
  }

  test("miles→km round conversion stays within half-milli tolerance") {
    forAll(Gen.chooseNum(0.0, 1000.0)) { (mi: Double) =>
      val km = BigDecimal(mi * 1.609344)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(km / 1.609344 - mi) <= 0.0005 / 1.609344 + 1e-9)
    }
  }
}
