package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{FloatVecDot, KmvDistinct, Sha256Prefix64, VecDistSq}

/** Session-extension hook: registers the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get them without
  * the Scala API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * `sha256_prefix64(s)` — signed-positive first 8 bytes of SHA-256
  * (the streaming surrogate trip id, ref:
  * usp_upsert_trips_from_streaming.sql:14-16).
  * `vec_dot(a, b)` — codegen'd float-vector dot product (similarity
  * search hot path).
  * `vec_dist_sq(v, c)` — codegen'd squared L2 distance between an
  * `array<float>` vector and an `array<double>` centroid (IVF/k-means
  * assignment hot path).
  * `kmv_distinct(s, k)` — deterministic K-Minimum-Values distinct-count
  * sketch (k must be an INT literal).
  * `asof_join(l, r, keys, lts, rts, payload[, direction])` — table-valued
  * as-of join over named tables/views ([[graft.sql.AsofTableFunction]]).
  * `range_join(l, r, point, lo, hi, binWidth)` — explicit bin-bucketized
  * point-in-interval join ([[graft.sql.RangeTableFunction]]).
  * `snapshot_at(dir[, version])` — VERSION-AS-OF time travel over
  * [[graft.ops.SnapshotTable]] dirs ([[graft.sql.SnapshotTableFunction]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def requireArity(name: String, expected: Int, args: Seq[Expression]): Unit =
    if (args.size != expected) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> args.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    // opt-in BETWEEN-join → bin-bucketized range-join rewrite
    e.injectOptimizerRule(session => graft.plans.RangeJoinRule(session))
    // table-valued as-of join for the SQL-first audience:
    // SELECT * FROM asof_join('l','r','keys','lts','rts','pay','backward')
    e.injectTableFunction((
      new FunctionIdentifier(graft.sql.AsofTableFunction.name),
      new ExpressionInfo(graft.sql.AsofTableFunction.getClass.getName,
        graft.sql.AsofTableFunction.name),
      (args: Seq[Expression]) => graft.sql.AsofTableFunction.build(args)))
    // explicit bin-width range join (the rule-independent SQL entry):
    // SELECT * FROM range_join('pts','ivs','p','lo','hi', 10)
    e.injectTableFunction((
      new FunctionIdentifier(graft.sql.RangeTableFunction.name),
      new ExpressionInfo(graft.sql.RangeTableFunction.getClass.getName,
        graft.sql.RangeTableFunction.name),
      (args: Seq[Expression]) => graft.sql.RangeTableFunction.build(args)))
    // snapshot time travel (VERSION AS OF) over SnapshotTable dirs:
    // SELECT * FROM snapshot_at('/wh/core_trip_clean', 3)
    e.injectTableFunction((
      new FunctionIdentifier(graft.sql.SnapshotTableFunction.name),
      new ExpressionInfo(graft.sql.SnapshotTableFunction.getClass.getName,
        graft.sql.SnapshotTableFunction.name),
      (args: Seq[Expression]) => graft.sql.SnapshotTableFunction.build(args)))
    // snapshot commit audit trail (DESCRIBE HISTORY):
    // SELECT * FROM snapshot_history('/wh/core_trip_clean')
    e.injectTableFunction((
      new FunctionIdentifier(graft.sql.SnapshotHistoryFunction.name),
      new ExpressionInfo(graft.sql.SnapshotHistoryFunction.getClass.getName,
        graft.sql.SnapshotHistoryFunction.name),
      (args: Seq[Expression]) => graft.sql.SnapshotHistoryFunction.build(args)))
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        requireArity("vec_dot", 2, args)
        FloatVecDot(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("vec_dist_sq"),
      new ExpressionInfo(classOf[VecDistSq].getName, "vec_dist_sq"),
      (args: Seq[Expression]) => {
        requireArity("vec_dist_sq", 2, args)
        VecDistSq(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (args: Seq[Expression]) => {
        requireArity("kmv_distinct", 2, args)
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "SEED_EXPRESSION_IS_UNFOLDABLE", // closest stock class: needs a literal
            messageParameters = Map(
              "seedExpr" -> other.sql, "exprWithSeed" -> "`kmv_distinct`"))
        }
        KmvDistinct(args.head, k).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("sha256_prefix64"),
      new ExpressionInfo(classOf[Sha256Prefix64].getName, "sha256_prefix64"),
      (args: Seq[Expression]) => {
        // arity is checked HERE (the builder runs at analysis time) so a
        // zero- or two-arg SQL call raises AnalysisException, never a
        // builder NoSuchElementException at plan time
        requireArity("sha256_prefix64", 1, args)
        Sha256Prefix64(args.head)
      }))
  }
}
