package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe over a broadcast filter — the
  * decontamination prefilter's hot path (`DocPipeline
  * .bloomContaminationFromShingles` runs it once per corpus shingle).
  *
  * A Scala UDF here would break the whole-stage-codegen span around the
  * scan+filter and pay boxing per row; this expression inlines
  * `bloom.mightContainLong(h)` into the generated code. The filter rides
  * an explicit `Broadcast` (one copy per executor, not per task closure),
  * embedded in the generated class via `addReferenceObj`. */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(LongType)

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference the Broadcast (stable across codegen), deref per row —
    // value() is a cheap read once the block is local.
    val ref = ctx.addReferenceObj("bloomBc", bloom, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((${classOf[BloomFilter].getName}) $ref.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point: `mightContain(bloomBc, h)`. */
  def mightContain(bloom: Broadcast[BloomFilter], h: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(h), bloom))
}
