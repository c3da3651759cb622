package graft

import org.apache.spark.sql.functions._

import graft.functions.TaxiFunctions._
import graft.functions.Sha256Prefix64Util
import org.apache.spark.unsafe.types.UTF8String

/** Unit tests for the scalar library (SURVEY §2.3) on literal frames,
  * including the reference's boundary semantics. */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("nightFlag boundaries: 21:59 day, 22:00 night, 05:59 night, 06:00 day") {
    val df = Seq("2024-01-01 21:59:59", "2024-01-01 22:00:00",
      "2024-01-01 05:59:59", "2024-01-01 06:00:00")
      .toDF("s").select(nightFlag(col("s").cast("timestamp")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 1, 0))
  }

  test("durationMin counts minute-boundary crossings (T-SQL semantics)") {
    val df = Seq(
      ("2024-01-01 10:00:59", "2024-01-01 10:01:00"), // 1s elapsed, 1 crossing
      ("2024-01-01 10:00:00", "2024-01-01 10:00:59"), // 59s elapsed, 0 crossings
      ("2024-01-01 10:30:00", "2024-01-01 10:00:00")) // negative
      .toDF("p", "d")
      .select(durationMin(col("p").cast("timestamp"), col("d").cast("timestamp")))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 0L, -30L))
  }

  test("milesToKm rounds to 3 decimals") {
    val r = Seq(1.0, 2.5).toDF("mi").select(milesToKm(col("mi"))).collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(1.609, 4.023))
  }

  test("cleanTrimNull: blank to NULL, trims, uppercases") {
    val r = Seq("  ", " ab ", "x").toDF("v")
      .select(cleanTrimNull(col("v"))).collect().map(r => Option(r.get(0)))
    assert(r.toSeq == Seq(None, Some("AB"), Some("X")))
  }

  test("basename takes the final path segment") {
    val r = Seq("a/b/c.csv", "plain.csv").toDF("p")
      .select(basename(col("p"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("c.csv", "plain.csv"))
  }

  test("sha256TripId: NULL components render as empty, stable hex") {
    val df = Seq(("v1", "2024-01-01 10:00:00")).toDF("v", "p")
      .select(sha256TripId(col("v"), col("p").cast("timestamp"),
        lit(null).cast("timestamp"), lit(10.5), lit(2.0), lit("CARD")).as("id"))
    val id = df.collect()(0).getString(0)
    assert(id.length == 64 && id.matches("[0-9a-f]{64}"))
    // NULL dropoff == empty string slot: same as explicit empty render
    val manual = java.security.MessageDigest.getInstance("SHA-256")
      .digest("v1|2024-01-01T10:00:00.000||10.500000|2.000000|CARD".getBytes)
      .map("%02x".format(_)).mkString
    assert(id == manual)
  }

  test("hash64 matches a pure-JVM reimplementation and is non-negative") {
    def ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes)
      math.abs(d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)))
    }
    val inputs = Seq("a", "xyz", "e|2024-01-01T00:00:00.000|2024-01-01T00:10:00.000")
    val got = inputs.toDF("s").select(hash64Id(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(ref))
    assert(got.forall(_ >= 0))
    inputs.foreach(s =>
      assert(Sha256Prefix64Util.hash64(UTF8String.fromString(s)) == ref(s)))
  }

  test("sha256_prefix64 SQL: non-string input fails at analysis") {
    Seq("a").toDF("s").createOrReplaceTempView("sp64_in")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sha256_prefix64(123) FROM sp64_in").collect()
    }
    assert(e.getMessage.toUpperCase.contains("DATATYPE_MISMATCH") ||
      e.getMessage.toLowerCase.contains("requires the \"string\" type") ||
      e.getMessage.toLowerCase.contains("string"))
  }

  test("sha256_prefix64 SQL: wrong arity fails at analysis") {
    Seq("a").toDF("s").createOrReplaceTempView("sp64_in2")
    val zero = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sha256_prefix64() FROM sp64_in2").collect()
    }
    assert(zero.getMessage.contains("sha256_prefix64"))
    val two = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sha256_prefix64(s, s) FROM sp64_in2").collect()
    }
    assert(two.getMessage.contains("sha256_prefix64"))
  }

  test("vec_dot equals the HOF dot bit-for-bit and fails analysis on bad types") {
    val vecs = Seq(
      (1L, Array(0.25f, -1.5f, 3.125f), Array(2.0f, 0.5f, -0.75f)),
      (2L, Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f)))
      .toDF("id", "a", "b")
    val hof = vecs.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).collect().map(_.getDouble(0))
    val native = vecs.select(
      graft.functions.FloatVecDot.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    // bit-identical, not approximately equal: same left-to-right order
    assert(java.util.Arrays.equals(
      hof.map(java.lang.Double.doubleToLongBits),
      native.map(java.lang.Double.doubleToLongBits)))
    // SQL registration + codegen path
    vecs.createOrReplaceTempView("vec_in")
    val sql = spark.sql("SELECT vec_dot(a, b) FROM vec_in ORDER BY id")
      .collect().map(_.getDouble(0))
    assert(sql.toSeq == native.toSeq)
    // non-array input fails at analysis, as does wrong arity
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(id, a) FROM vec_in").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(a) FROM vec_in").collect()
    }
  }

  test("vec_dist_sq is SQL-registered with the same guards as vec_dot") {
    val rows = Seq(
      (1L, Array(1.0f, 2.0f), Array(0.5, 1.5)),
      (2L, Array(0.0f, 0.0f), Array(3.0, 4.0))).toDF("id", "v", "c")
    rows.createOrReplaceTempView("vds_in")
    val sql = spark.sql("SELECT vec_dist_sq(v, c) FROM vds_in ORDER BY id")
      .collect().map(_.getDouble(0))
    assert(sql.toSeq == Seq(0.5, 25.0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dist_sq(id, c) FROM vds_in").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dist_sq(v) FROM vds_in").collect()
    }
  }

  test("vector kernels return NULL on null array elements, like the HOF fold") {
    val rows = Seq(
      (1L, Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (2L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)))
      .toDF("id", "a", "b")
    val dot = rows.orderBy("id")
      .select(graft.functions.FloatVecDot.dot(col("a"), col("b")))
      .collect().map(r => Option(r.get(0)))
    assert(dot(0).isEmpty, "null element poisons the sum, as aggregate(zip_with(...)) would")
    assert(dot(1).contains(11.0))
    val dist = rows.orderBy("id")
      .select(graft.functions.VecDistSq.distSq(col("a"), col("b").cast("array<double>")))
      .collect().map(r => Option(r.get(0)))
    assert(dist(0).isEmpty)
    assert(dist(1).contains(8.0))
  }

  test("kmv_distinct: exact below k, ~1/sqrt(k) above, partition-invariant") {
    val small = (1 to 100).map(i => s"v$i").toDF("s")
    val exactBelow = small.select(
      graft.functions.KmvDistinct.of(col("s"), 256)).collect().head.getDouble(0)
    assert(exactBelow == 100.0, "below k the sketch is exact")

    val big = (1 to 50000).map(i => s"key-$i").toDF("s")
    val est = big.select(
      graft.functions.KmvDistinct.of(col("s"), 256)).collect().head.getDouble(0)
    assert(math.abs(est - 50000) / 50000 < 0.2,
      s"k=256 estimate within ~3/sqrt(k): $est")
    // merge correctness: the estimate is independent of partitioning
    // (map-side partials + TreeSet-union merges)
    val est2 = big.repartition(13).select(
      graft.functions.KmvDistinct.of(col("s"), 256)).collect().head.getDouble(0)
    assert(est2 == est, "partition layout never changes the sketch")

    // SQL registration; k must be an INT literal
    big.createOrReplaceTempView("kmv_in")
    val sql = spark.sql("SELECT kmv_distinct(s, 256) FROM kmv_in")
      .collect().head.getDouble(0)
    assert(sql == est)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_distinct(s, length(s)) FROM kmv_in").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_distinct(s) FROM kmv_in").collect()
    }
  }

  test("char_entropy_stats: histogram facts, composed-form parity, empty is NULL") {
    val df = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"), (4L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.CharEntropyStats.of(col("text")).as("st"))
    val got = df.collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(got(4L).isEmpty, "empty text is NULL (doc stays absent downstream)")
    val uniform4 = got(2L).get
    assert(uniform4.getLong(0) == 4L && uniform4.getLong(1) == 4L)
    assert(math.abs(uniform4.getDouble(2) - math.log(4)) < 1e-9,
      "4 distinct chars uniform = ln 4 nats")
    assert(got(3L).get.getDouble(2) == 0.0, "single-char run has zero entropy")
    // bit parity with the composed explode+round+decimal-sum form it replaced
    val composed = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "").groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .withColumn("total", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("term", round(-(col("c").cast("double") / col("total") *
        log(col("c").cast("double") / col("total"))), 12))
      .groupBy("doc_id")
      .agg(sum(col("term").cast("decimal(27,12)")).cast("double").as("entropy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    composed.foreach { case (id, e) =>
      assert(java.lang.Double.doubleToLongBits(e) ==
        java.lang.Double.doubleToLongBits(got(id).get.getDouble(2)),
        s"doc $id: expression must be bit-identical to the composed form")
    }
  }

  test("repetition_stats: ttr and top-bigram share, single-token doc has NULL bigram frac") {
    val df = Seq(
      (1L, "a b a b a b"),     // 2 types / 6 tokens; "a b" bigram 3 of 5
      (2L, "x"),               // single token: no bigrams
      (3L, "p q r s"))         // all distinct; every bigram unique
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.RepetitionStats.of(
        split(trim(col("text")), "\\s+")).as("st"))
      .select(col("doc_id"), col("st.type_token_ratio").as("ttr"),
        col("st.top_bigram_frac").as("tbf"))
    val got = df.collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(1L) == ((2.0 / 6.0, Some(3.0 / 5.0))), s"repeated bigram dominates: $got")
    assert(got(2L) == ((1.0, None)), "single token: ttr 1, bigram frac NULL")
    assert(got(3L) == ((1.0, Some(1.0 / 3.0))), "distinct corpus: unique bigrams")
  }

  test("safeDivide guards zero/negative denominators") {
    val r = Seq((1.0, 0.0), (1.0, 2.0), (1.0, -1.0)).toDF("a", "b")
      .select(safeDivide(col("a"), col("b"))).collect().map(r => Option(r.get(0)))
    assert(r.toSeq == Seq(None, Some(0.5), None))
  }
}
