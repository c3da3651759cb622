package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

import graft.docs.EmbeddingOps

/** Guards the embeddings-fixture physical-type seam (the events-`ts`
  * break class, round 7): float64 lists and int32 ids must normalize to
  * the engine's ARRAY<FLOAT> + BIGINT contract with identical values. */
class EmbeddingsSchemaSpec extends SparkSpec {

  private def writeFixture(dir: String, asDouble: Boolean): Unit = {
    val s = spark
    import s.implicits._
    val base = Seq(
      (0L, Array(0.25f, -1.5f, 3.0f, 0.125f), 1),
      (1L, Array(2.0f, 0.5f, -0.75f, 4.0f), 2),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out =
      if (asDouble) base
        .withColumn("vec_id", col("vec_id").cast("int"))
        .withColumn("embedding", col("embedding").cast("array<double>"))
      else base
    out.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("float32 and float64 fixture generations read to identical vectors") {
    val fDir = tmpDir("emb_f32"); val dDir = tmpDir("emb_f64")
    writeFixture(fDir, asDouble = false)
    writeFixture(dDir, asDouble = true)
    val ef = EmbeddingOps.embeddings(spark, fDir)
    val ed = EmbeddingOps.embeddings(spark, dDir)
    for (e <- Seq(ef, ed)) {
      assert(e.schema("vec_id").dataType == LongType)
      assert(e.schema("embedding").dataType == ArrayType(FloatType))
    }
    val a = ef.orderBy("vec_id").collect().toSeq
    val b = ed.orderBy("vec_id").collect().toSeq
    assert(a == b, "float-representable doubles cast losslessly")
    // the codegen kernel runs on both generations
    val dots = ed.select(EmbeddingOps.dot(col("embedding"), col("embedding")))
      .orderBy("vec_id").collect().map(_.getDouble(0))
    assert(dots.head == (0.25 * 0.25 + 1.5 * 1.5 + 3.0 * 3.0 + 0.125 * 0.125))
  }

  test("the driver fixture (current generation) reads under the contract") {
    val e = EmbeddingOps.embeddings(spark, sf())
    assert(e.schema("embedding").dataType == ArrayType(FloatType))
    assert(e.schema("vec_id").dataType == LongType)
    assert(e.limit(3).count() == 3)
  }
}
