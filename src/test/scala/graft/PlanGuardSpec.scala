package graft

/** Engine-wide plan hygiene: walks EVERY declared query's plan and
  * rejects the three shapes that silently stop scaling — a true
  * cartesian product (a broadcast cross join of a census/1-row frame is
  * fine and planned as BroadcastNestedLoopJoin; CartesianProductExec of
  * two big sides is never fine), `monotonically_increasing_id`
  * (partition-layout-dependent, breaks replay idempotence), and a
  * window with an EMPTY partition spec (`Window.orderBy` without
  * `partitionBy` — plans as Exchange SinglePartition + one-task sort;
  * the scalable total-order rank is `ops/GlobalRowNumber`). A new query
  * that regresses into any of these fails here before it ships, not in
  * a 100 TB run.
  */
class PlanGuardSpec extends SparkSpec {

  test("no declared query plans a cartesian product, a nondeterministic id, " +
    "or a partition-less window") {
    val d = sf() // sf0.001: construction side effects (scratch writes,
    // memo materializations, iterative training) stay cheap
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val qe =
          try fn(spark, d).queryExecution
          catch {
            case e: Throwable => fail(s"$name failed to build/plan: $e")
          }
        val plan = qe.executedPlan.toString
        // logical-plan structural walk: a physical-string match for
        // "empty partition spec" would need fragile bracket counting
        val globalWindows = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        // opaque Scala UDFs break codegen fusion and column pruning;
        // every scalar extension in this repo is a native Expression
        val udfs = qe.optimizedPlan.flatMap(_.expressions).flatMap(_.collect {
          case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
        })
        Seq("CartesianProduct" -> plan.contains("CartesianProduct"),
          "monotonically_increasing_id" ->
            plan.contains("monotonically_increasing"),
          "global window (empty partitionBy)" -> globalWindows.nonEmpty,
          "ScalaUDF (opaque, non-codegen)" -> udfs.nonEmpty)
          .collect { case (what, true) => s"$name: $what" }
    }
    assert(offenders.isEmpty,
      s"scale-hostile plan shapes in declared queries: $offenders")
  }
}
