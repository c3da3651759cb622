package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper shared by interpreted eval and generated code. */
object Sha256Prefix64Util {
  /** First 8 bytes of SHA-256(utf8(s)) interpreted as a big-endian *signed*
    * 64-bit integer, then ABS — the T-SQL
    * `ABS(CONVERT(BIGINT, SUBSTRING(HASHBYTES('SHA2_256', nk), 1, 8)))`
    * idiom (reference: sql/streaming/staging/
    * usp_upsert_trips_from_streaming.sql:14-16).
    *
    * Note `conv(substring(sha2(x,256),1,16),16,10)` cannot express this:
    * `conv` parses the 16 hex digits as *unsigned* and saturates/wraps,
    * losing the signed reinterpretation the reference relies on
    * (SURVEY.md §7.3). Math.abs(Long.MinValue) == Long.MinValue is accepted
    * (probability 2^-64; T-SQL would raise there).
    */
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  def hash64(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    math.abs(v)
  }
}

/** Catalyst expression for [[Sha256Prefix64Util.hash64]] with full codegen,
  * so it participates in whole-stage codegen instead of falling back to a
  * Scala UDF call path. */
case class Sha256Prefix64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "sha256_prefix64"

  /** Strict STRING input (no implicit numeric→string coercion): hashing the
    * string *rendering* of a number is almost certainly a caller bug, so a
    * non-string argument fails at ANALYSIS (DATATYPE_MISMATCH), not at
    * codegen/runtime. */
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    Sha256Prefix64Util.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sha256Prefix64Util.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha256Prefix64 =
    copy(child = newChild)
}

object Sha256Prefix64 {
  import org.apache.spark.sql.graft.Bridge

  /** Column-API entry point: `hash64(nk)` */
  def hash64(nk: Column): Column =
    Bridge.column(Sha256Prefix64(Bridge.expression(nk)))
}
