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

  test("ANN audit panels are fixed-size: the id-cap literal survives into " +
    "the optimized plan") {
    // Round-12 regression guard: a probe set defined only by a RATE
    // (vec_id % 50 = 0) grows with the corpus and turns the exact or
    // cell-scoped scan quadratic (measured exp 1.4-2.1 at x20 before the
    // caps, SCALING.md). Every audit-panel query must keep an absolute id
    // cap (< 2000 vecs / < 5000 docs or media) alongside the stride; if a
    // refactor drops it, this walk stops finding the LessThan literal.
    import org.apache.spark.sql.catalyst.expressions.{LessThan, Literal}
    val d = sf()
    val capped = Seq("ann_bruteforce_topk", "ann_ivf", "ann_lsh_bucketed",
      "ann_ivfpq", "ann_pq_adc", "ann_recall", "media_ann",
      "search_hybrid_rrf")
    val missing = capped.filterNot { name =>
      val qe = SparkEntry.queries(name)(spark, d).queryExecution
      qe.optimizedPlan.flatMap(_.expressions).exists(_.collectFirst {
        case lt @ LessThan(_, Literal(v, _))
            if v == 2000L || v == 5000L => lt
      }.nonEmpty)
    }
    assert(missing.isEmpty,
      s"rate-only probe panels (id cap missing from plan) in: $missing")
  }
}
