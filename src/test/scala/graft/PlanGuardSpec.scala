package graft

/** Engine-wide plan hygiene: walks EVERY declared query's physical plan
  * and rejects the two shapes that silently stop scaling — a true
  * cartesian product (a broadcast cross join of a census/1-row frame is
  * fine and planned as BroadcastNestedLoopJoin; CartesianProductExec of
  * two big sides is never fine) and `monotonically_increasing_id`
  * (partition-layout-dependent, breaks replay idempotence). A new query
  * that regresses into either shape fails here before it ships, not in a
  * 100 TB run.
  */
class PlanGuardSpec extends SparkSpec {

  test("no declared query plans a cartesian product or a nondeterministic id") {
    val d = sf() // sf0.001: construction side effects (scratch writes,
    // memo materializations, iterative training) stay cheap
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, d).queryExecution.executedPlan.toString
          catch {
            case e: Throwable => fail(s"$name failed to build/plan: $e")
          }
        Seq("CartesianProduct" -> plan.contains("CartesianProduct"),
          "monotonically_increasing_id" ->
            plan.contains("monotonically_increasing"))
          .collect { case (what, true) => s"$name: $what" }
    }
    assert(offenders.isEmpty,
      s"scale-hostile plan shapes in declared queries: $offenders")
  }
}
