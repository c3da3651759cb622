package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row token-repetition stats over a token array: type/token ratio
  * and the top-bigram share — the [[CharEntropyStats]] pattern applied to
  * the repetition detector.
  *
  * The composed form exploded every token AND every bigram into rows and
  * shuffled three times by doc_id for what is a per-document scalar pair;
  * this expression counts inside the scan projection — zero shuffles,
  * and the token array never leaves the stage.
  *
  * Semantics contract (bit parity with the composed form and the DuckDB
  * oracle): the input is the SAME `split(trim(text), "\\s+")` array (the
  * split stays in Catalyst, so tokenization semantics are untouched);
  * type_token_ratio = distinct/total tokens, top_bigram_frac =
  * max bigram count / total bigrams — plain IEEE divides of exact longs,
  * no libm. Docs with < 2 tokens have no bigrams: top_bigram_frac is
  * NULL, exactly like the composed form's LEFT JOIN miss. Null array
  * elements cannot occur from `split` (it never yields null slots). */
object RepetitionStatsUtil {
  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) {
      // split(trim(x),"\s+") yields at least [""] — defensive: an
      // explicitly empty array means no tokens at all.
      return null
    }
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val distinct = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val ttr = distinct.size().toDouble / n.toDouble
    if (n < 2)
      return new GenericInternalRow(Array[Any](ttr, null))
    val bigrams = new java.util.HashMap[UTF8String, Array[Long]]()
    var maxC = 0L
    i = 0
    while (i < n - 1) {
      val bg = UTF8String.concatWs(UTF8String.fromString(" "),
        toks(i), toks(i + 1))
      val slot = bigrams.get(bg)
      val c = if (slot == null) { bigrams.put(bg, Array(1L)); 1L }
              else { slot(0) += 1L; slot(0) }
      if (c > maxC) maxC = c
      i += 1
    }
    val totalBg = (n - 1).toLong
    new GenericInternalRow(Array[Any](ttr, maxC.toDouble / totalBg.toDouble))
  }
}

case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StructType(Seq(
    StructField("type_token_ratio", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = true)))
  override def prettyName: String = "repetition_stats"
  override def nullable: Boolean = true

  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsUtil.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.RepetitionStatsUtil.stats($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def of(tokens: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(tokens)))
}
