package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual average-hash of a binary payload — the per-row
  * collapse of the `transform(sequence(0,63), substr→hex→conv)` sample
  * grid (see `MediaOps.phashPairs`), which allocated two strings per
  * sample per row to read one byte.
  *
  * Definition (bit-identical to the expression-composed form): sample c
  * (c = 0..63) is the unsigned byte at offset ⌊c·len/64⌋; the mean is
  * sum/64.0; bit c is set iff sample_c > mean. The ⌊c·len/64⌋ division
  * here uses long integer division, which equals the composed form's
  * `floor(c*len/64.0)` exactly — c·len is exact in double below 2^52
  * and /64 is a power-of-two exponent shift, so the double floor IS the
  * integer quotient. An empty payload hashes to 0L (all samples 0, mean
  * 0, 0 > 0 false), matching the composed form's `when(len === 0, 0)`
  * guard. */
object AHash64Util {
  def ahash(payload: Array[Byte]): Long = {
    val len = payload.length
    if (len == 0) return 0L
    val s = new Array[Int](64)
    var sum = 0L
    var c = 0
    while (c < 64) {
      val v = payload((c.toLong * len / 64).toInt) & 0xff
      s(c) = v
      sum += v
      c += 1
    }
    val mean = sum.toDouble / 64.0
    var h = 0L
    c = 0
    while (c < 64) {
      if (s(c) > mean) h |= (1L << c)
      c += 1
    }
    h
  }
}

case class AHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "ahash64"

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(BinaryType)

  override def nullSafeEval(input: Any): Any =
    AHash64Util.ahash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AHash64Util.ahash($c)")

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

object AHash64 {
  def of(payload: Column): Column =
    Bridge.column(AHash64(Bridge.expression(payload)))
}
