package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two `array<float>` columns, summing left-to-right
  * in double — the similarity-search hot path (ref: EmbeddingOps scoring,
  * brute-force = |corpus| × |queries| evaluations).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the higher-order
  * -function form allocates a zipped intermediate array and runs a lambda
  * interpreter per element, and does not generate a tight loop. This
  * expression participates in whole-stage codegen with a primitive double
  * accumulator over the two `ArrayData` buffers — no allocation, no boxing.
  *
  * Semantics match the HOF form exactly on well-formed embeddings: same
  * left-to-right double summation (bit-identical, DuckDB-oracle-safe),
  * and a NULL element in either array makes the whole result NULL, as
  * `aggregate(zip_with(...))` does (a null slot would poison the fold).
  * Length mismatch truncates to the shorter side (the HOF form instead
  * null-pads and so returns NULL — documented divergence). */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true // NULL on null array elements

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  def dot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))
}
