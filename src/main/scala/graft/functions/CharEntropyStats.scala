package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row char-frequency stats: one pass over the string, no explode.
  *
  * The composed form ([[graft.docs.DocPipeline.charEntropy]]'s original
  * shape) exploded every character into a (doc_id, ch) row — ~N_chars
  * rows through two shuffles for what is a per-document scalar. This
  * expression computes the histogram inside the scan projection, so the
  * operator carries ZERO shuffles and the text column never leaves the
  * scan stage.
  *
  * Determinism contract (the reason the arithmetic below is spelled out
  * byte-for-byte): the result must be bit-identical to the composed
  * form and to the DuckDB oracle. Per distinct character,
  * p = count/total (IEEE double divide), term = −(p · ln p) with
  * `StrictMath.log` — exactly what Catalyst's `Log` evaluates — then
  * rounded via `BigDecimal(Double.toString(v)).setScale(12, HALF_UP)`,
  * which is exactly Catalyst `Round(_, 12)` on a double
  * (scala.math.BigDecimal.apply(d) goes through Double.toString — the
  * FLOATS.md M1 shortest-repr snap, reproduced on purpose). The rounded
  * terms are summed as exact scale-12 decimals (order-free, matching
  * `sum(cast(term as decimal(27,12)))`) and the total converts with
  * `doubleValue` (= Catalyst decimal→double cast).
  *
  * Characters are Unicode CODE POINTS (DuckDB `string_split(text, '')`
  * semantics; identical to the old `split(text, "")` path on the ASCII
  * corpus). Empty input returns NULL so empty docs stay absent from the
  * output, as the old explode+filter shape left them. */
object CharEntropyStatsUtil {
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    if (str.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var total = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      total += 1L
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
    }
    var entropy = JBigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c.toDouble / total.toDouble
      val term = -(p * StrictMath.log(p))
      entropy = entropy.add(
        JBigDecimal.valueOf(term).setScale(12, RoundingMode.HALF_UP))
    }
    new GenericInternalRow(Array[Any](
      total, counts.size().toLong, entropy.doubleValue()))
  }
}

/** Catalyst expression wrapper — struct<n_chars, distinct_chars, entropy>
  * with codegen via the static helper (the [[Sha256Prefix64]] pattern),
  * so the surrounding projection stays in whole-stage codegen. */
case class CharEntropyStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy_stats"
  override def nullable: Boolean = true // NULL on empty text

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    CharEntropyStatsUtil.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CharEntropyStatsUtil.stats($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {
  def of(text: Column): Column =
    Bridge.column(CharEntropyStats(Bridge.expression(text)))
}
