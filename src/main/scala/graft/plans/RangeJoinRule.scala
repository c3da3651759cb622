package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a naive point-in-interval join —
  * `L JOIN R ON l.p >= r.lo AND l.p <= r.hi` with no equi-key — into the
  * bin-bucketized shape of [[graft.ops.RangeJoin]]:
  *
  *   L+bin(p)  ⋈_bin  R×explode(bins(lo..hi))   then the exact BETWEEN
  *
  * Spark plans the raw form as BroadcastNestedLoopJoin (|L|×|R|
  * comparisons); the rewrite is a plain equi-join on the bin. Each
  * (point, interval) pair still appears exactly once — a point joins
  * only its own bin. Opt-in: fires only when
  * `spark.graft.rangeJoin.binWidth` is set (bin sizing needs domain
  * knowledge the optimizer doesn't have), and only on an Inner join
  * whose full condition is the one BETWEEN pair, sides resolved
  * point→left / bounds→right. Registered via
  * [[graft.GraftExtensions]] `injectOptimizerRule`. */
case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed conf value disables the rewrite (with a warning) rather
    // than throwing inside the optimizer and failing every session query
    val width = spark.conf.getOption(ConfKey).flatMap { s =>
      val parsed = scala.util.Try(s.toLong).toOption
      if (parsed.isEmpty)
        logWarning(s"$ConfKey='$s' is not a long; range-join rewrite disabled")
      parsed
    }.filter(_ > 0)
    width match {
      case None => plan
      case Some(w) => plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
          matchBetween(cond, left, right) match {
            case Some((p, lo, hi)) => rewrite(left, right, p, lo, hi, cond, w, hint)
            case None => j
          }
      }
    }
  }

  /** `(point, lo, hi)` when `cond` is exactly the BETWEEN pair with the
    * point from `left` and both bounds from `right`. */
  private def matchBetween(cond: Expression, left: LogicalPlan,
                           right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def sided(p: Expression, lo: Expression, hi: Expression) =
      p.references.subsetOf(left.outputSet) && p.deterministic &&
        lo.references.subsetOf(right.outputSet) && hi.references.subsetOf(right.outputSet) &&
        lo.deterministic && hi.deterministic &&
        Seq(p, lo, hi).forall(e => e.dataType == LongType ||
          e.dataType.isInstanceOf[org.apache.spark.sql.types.IntegerType])
    cond match {
      case And(ge, le) =>
        val lower = ge match {
          case GreaterThanOrEqual(p, lo) => Some((p, lo))
          case LessThanOrEqual(lo, p) => Some((p, lo))
          case _ => None
        }
        val upper = le match {
          case LessThanOrEqual(p, hi) => Some((p, hi))
          case GreaterThanOrEqual(hi, p) => Some((p, hi))
          case _ => None
        }
        (lower, upper) match {
          case (Some((p1, lo)), Some((p2, hi)))
              if p1.semanticEquals(p2) && sided(p1, lo, hi) => Some((p1, lo, hi))
          case _ => None
        }
      case _ => None
    }
  }

  /** floor(e / w) as a long bin id (same arithmetic as the DSL-level
    * `RangeJoin.pointInInterval`). */
  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      p: Expression, lo: Expression, hi: Expression,
                      originalCond: Expression, w: Long,
                      hint: JoinHint): LogicalPlan = {
    val binL = Alias(bin(p, w), "_graft_bin_l")()
    val newLeft = Project(left.output :+ binL, left)
    val seq = Sequence(bin(lo, w), bin(hi, w), None,
      Some(spark.sessionState.conf.sessionLocalTimeZone))
    val binR = AttributeReference("_graft_bin_r", LongType,
      nullable = seq.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)()
    val gen = Generate(
      Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binR), child = right)
    val joined = Join(newLeft, gen, Inner,
      Some(And(EqualTo(binL.toAttribute, binR), originalCond)), hint)
    Project(left.output ++ right.output, joined) // original schema back
  }
}
