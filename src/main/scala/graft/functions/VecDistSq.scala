package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance between an `array<float>` vector and an
  * `array<double>` centroid — the IVF/k-means assignment hot path
  * (|corpus| × |centroids| evaluations per round). Codegen'd tight loop,
  * same left-to-right double accumulation as the
  * `aggregate(zip_with(...))` form it replaces (bit-identical,
  * DuckDB-oracle-safe), and a NULL element in either array makes the
  * whole result NULL, as the HOF fold would. See [[FloatVecDot]] for
  * the rationale. */
case class VecDistSq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist_sq"
  override def nullable: Boolean = true // NULL on null array elements

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDistSq =
    copy(left = newLeft, right = newRight)
}

object VecDistSq {
  def distSq(v: Column, c: Column): Column =
    Bridge.column(VecDistSq(Bridge.expression(v), Bridge.expression(c)))
}
