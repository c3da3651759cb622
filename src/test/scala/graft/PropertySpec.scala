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

  test("per-row text expressions are bit-identical to the composed shapes they replaced (ScalaCheck)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Random docs over a small alphabet (forces repeats) plus unicode and
    // whitespace runs — the shapes most likely to expose split/codepoint
    // or tie-rounding divergence between the expression and the old plan.
    val word = Gen.oneOf(Gen.stringOfN(3, Gen.oneOf('a', 'b', 'ü')),
      Gen.oneOf("aa", "ab", "κόσμε", "x1", "..", "a"))
    val doc = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    forAll(doc, n = 60)(texts += _)
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
      .cache()
    // entropy: expression vs composed explode + round + decimal sum
    val exprEnt = graft.docs.DocPipeline.charEntropy(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val compEnt = df
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "").groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .withColumn("total", sum(col("c")).over(Window.partitionBy("doc_id")))
      .withColumn("term", round(-(col("c").cast("double") / col("total") *
        log(col("c").cast("double") / col("total"))), 12))
      .groupBy("doc_id")
      .agg(sum(col("term").cast("decimal(27,12)")).cast("double").as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    compEnt.foreach { case (id, e) =>
      assert(java.lang.Double.doubleToLongBits(e) ==
        java.lang.Double.doubleToLongBits(exprEnt(id)),
        s"entropy parity broke on doc $id: ${texts(id.toInt)}")
    }
    // simhash: expression vs the 64-aggregate vote plan
    val t = graft.docs.DocPipeline.tokenized(df)
    val exprSim = graft.docs.DocPipeline.simhashes(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val th = t.select(col("doc_id"), explode(col("t")).as("w"))
      .select(col("doc_id"), graft.functions.TaxiFunctions.hash64Id(col("w")).as("h"))
    val sums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val compSim = th.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), (0 until 64)
        .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    compSim.foreach { case (id, s) =>
      assert(s == exprSim(id), s"simhash parity broke on doc $id: ${texts(id.toInt)}")
    }
    // repetition: expression vs explode×2 + left-join shape
    val exprRep = graft.docs.DocPipeline.repetitionStats(df)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val n = size(col("t"))
    val bg = t.select(col("doc_id"), explode(
      when(n >= 2, transform(sequence(lit(1), n - 1),
        i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
        .otherwise(array())).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("topc"), sum(col("c")).as("total"))
    val compRep = t.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("doc_id").agg(countDistinct(col("w")).as("dt"), count(lit(1)).as("ntok"))
      .join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("dt").cast("double") / col("ntok")).as("ttr"),
        (col("topc").cast("double") / col("total")).as("tbf"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    compRep.foreach { case (id, v) =>
      assert(v == exprRep(id), s"repetition parity broke on doc $id: ${texts(id.toInt)}")
    }
    df.unpersist()
  }

  test("ahash64 is bit-identical to the composed substr/hex/conv resample it replaced (ScalaCheck)") {
    import spark.implicits._
    // Random payloads across the shapes that stress the resample: empty,
    // shorter than 64 bytes (sample indices repeat), exactly 64, long,
    // constant (mean ties: sample > mean must be strict), high bytes
    // (unsigned read), and runs (coarse structure).
    val payload = Gen.oneOf(
      Gen.const(List.empty[Int]),
      Gen.chooseNum(1, 63).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))),
      Gen.listOfN(64, Gen.chooseNum(-128, 127)),
      Gen.chooseNum(65, 400).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))),
      Gen.chooseNum(1, 200).map(n => List.fill(n)(7)),
      Gen.chooseNum(1, 200).flatMap(n => Gen.listOfN(n, Gen.oneOf(-1, -128, 0, 127))))
      .map(_.map(_.toByte).toArray)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    forAll(payload, n = 80)(rows += _)
    val df = rows.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toSeq.toDF("id", "payload")
    val len = length(col("payload"))
    val samples = transform(sequence(lit(0), lit(63)), c =>
      when(len === 0, lit(0)).otherwise(
        conv(hex(substr(col("payload"),
          (floor(c * len / 64) + 1).cast("int"), lit(1))), 16, 10)
          .cast("int")))
    val composed = df.select(col("id"), samples.as("_s"))
      .withColumn("_mean",
        aggregate(col("_s"), lit(0L), (a, x) => a + x).cast("double") / 64.0)
      .withColumn("ph", (0 until 64).map(c =>
        when(element_at(col("_s"), c + 1) > col("_mean"), lit(1L << c))
          .otherwise(lit(0L))).reduce(_ bitwiseOR _))
      .select("id", "ph")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = df.select(col("id"),
        graft.functions.AHash64.of(col("payload")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    composed.foreach { case (id, h) =>
      assert(h == native(id),
        s"ahash parity broke on payload $id (len=${rows(id.toInt).length})")
    }
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

  test("int8 quantization: codes bounded, error within half a step, zero-safe") {
    import spark.implicits._
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f)).map(_.toArray)
    val vecs = (0 until 60).flatMap(i =>
      vecGen.apply(Gen.Parameters.default, Seed(7L + i))).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val rows = (vecs :+ (999L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        graft.docs.EmbeddingOps.quantizeInt8(col("embedding")).as("q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val q = r.getSeq[Int](2)
      assert(q.forall(c => c >= -127 && c <= 127), "codes in [-127, 127]")
      val mx = v.map(x => math.abs(x.toDouble)).max
      if (mx == 0.0) assert(q.forall(_ == 0), "zero vector → zero codes")
      else {
        val scale = mx / 127.0
        q.zip(v).foreach { case (c, x) =>
          assert(math.abs(c * scale - x) <= scale / 2 + 1e-9,
            s"dequant error within half a step: c=$c x=$x scale=$scale") }
      }
    }
  }

  test("hash split: buckets in [0,100), assignment independent of corpus") {
    import spark.implicits._
    forAll(Gen.chooseNum(1L, 1000000L), n = 50) { (id: Long) =>
      val one = Seq((id, "t")).toDF("doc_id", "text")
      val b = graft.docs.DocPipeline.hashSplit(one, "doc_id", 80, 10)
        .select("split_bucket").collect().head.getLong(0)
      assert(b >= 0 && b < 100)
      // the bucket is a pure function of the id — row context never matters
      val b2 = graft.docs.DocPipeline.hashSplit(
        Seq((id, "other"), (id + 1, "x")).toDF("doc_id", "text"), "doc_id", 80, 10)
        .filter(col("doc_id") === id)
        .select("split_bucket").collect().head.getLong(0)
      assert(b2 == b)
    }
  }

  test("BloomMightContain matches the driver-side probe, no false negatives, null-safe") {
    import spark.implicits._
    val items = (1L to 500L).map(_ * 7919L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000L, 0.01)
    items.foreach(bloom.putLong)
    val bc = spark.sparkContext.broadcast(bloom)
    val probes = items ++ (1L to 1000L) // members + mostly-absent values
    val got = probes.toDF("h")
      .select(col("h"), graft.functions.BloomMightContain.mightContain(bc, col("h")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach(h => assert(got(h) == bloom.mightContainLong(h),
      s"codegen probe diverges from driver probe at $h"))
    items.foreach(h => assert(got(h), s"bloom false negative at $h"))
    // NULL in → NULL out (UnaryExpression null-intolerance)
    val n = Seq[Option[Long]](None).toDF("h")
      .select(graft.functions.BloomMightContain.mightContain(bc, col("h"))).collect()
    assert(n.head.isNullAt(0))
  }
}
