package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit simhash of a token array in one pass — the per-row collapse of
  * the explode + 64-aggregate groupBy shape (Charikar 2002 simhash: per
  * bit j, sum +1/−1 over each token occurrence's hash bit j; the output
  * bit is set iff the sum is positive — ties land 0, exactly like the
  * old `sum(when(bit,1).otherwise(-1)) > 0`).
  *
  * Token hashing is [[Sha256Prefix64Util.hash64]] — the same function
  * the exploded shape applied per row — and multiplicity counts (the
  * input is the raw token array, not a set), so the resulting signature
  * is bit-identical to the old frame and to the DuckDB oracle's
  * replayed definition. The 64 counters live in a stack array; the
  * expression participates in whole-stage codegen via the static
  * helper, and the signature generation stage carries ZERO shuffles. */
object SimhashFromTokensUtil {
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = Sha256Prefix64Util.hash64(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }
}

case class SimhashFromTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    SimhashFromTokensUtil.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimhashFromTokensUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashFromTokens =
    copy(child = newChild)
}

object SimhashFromTokens {
  def of(tokens: Column): Column =
    Bridge.column(SimhashFromTokens(Bridge.expression(tokens)))
}
