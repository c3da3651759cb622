package graft

import org.apache.spark.sql.functions.col

import graft.queries.Panels

/** Codifies the round-12 design lesson (SCALING.md): a probe/audit/eval
  * panel defined by a RATE (`every Nth id`) couples workload size to
  * corpus size — 8 ops measured superlinear at x20 before the class was
  * fixed. Two enforcement halves:
  *
  *  1. every panel in [[Panels.registry]] is measured corpus-independent
  *     LIVE: it selects exactly `cap` members from id domains far past
  *     its bound, and the same count at 4x the domain;
  *  2. a source tripwire over the declared-query files: any
  *     `.filter(... % N === 0 ...)` must either go through `Panels.` or
  *     carry an explicit `corpus-fraction` marker (batch splits and
  *     synthesis dirt are corpus fractions BY SEMANTICS — flagging
  *     intent is the point, silently reintroducing a rate-defined panel
  *     is the bug).
  */
class PanelGuardSpec extends SparkSpec {

  test("every registered panel selects exactly its cap, independent of the id domain") {
    Panels.registry.foreach { case (name, p) =>
      val at5m = spark.range(0, 5000000).filter(p(col("id"))).count()
      val at20m = spark.range(0, 20000000).filter(p(col("id"))).count()
      assert(at5m == p.cap,
        s"panel '$name' selected $at5m members from a 5M-id domain, declared cap ${p.cap}")
      assert(at20m == at5m,
        s"panel '$name' grew with the id domain ($at5m -> $at20m): rate-defined, not fixed")
    }
  }

  test("panel bounds are non-binding at the sf0.1 id domains (gate results unchanged)") {
    // documents/media doc_id domain at sf0.1 is [0, 5000), embeddings
    // vec_id domain is [0, 2000): a bound below those would change the
    // driver-fixture results, which the round-12 caps promised not to do
    assert(Panels.annProbe.bound >= 2000)
    Seq(Panels.mediaAudit, Panels.contamEval, Panels.bloomEval)
      .foreach(p => assert(p.bound >= 5000))
  }

  test("no declared-query file introduces a rate-only % N === 0 filter outside Panels") {
    val qdir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    assert(java.nio.file.Files.isDirectory(qdir),
      s"expected to run from the repo root; missing $qdir")
    val rx = raw"filter\(.*% *\d+ *=== *0".r
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val files = java.nio.file.Files.list(qdir)
    try files.forEach { f =>
      val name = f.getFileName.toString
      if (name.endsWith(".scala") && name != "Panels.scala") {
        val lines = java.nio.file.Files.readAllLines(f)
        (0 until lines.size).foreach { i =>
          val line = lines.get(i)
          if (rx.findFirstIn(line).isDefined) {
            val marked = line.contains("Panels.") ||
              line.contains("corpus-fraction") ||
              (i > 0 && lines.get(i - 1).contains("corpus-fraction"))
            if (!marked) offenders += s"$name:${i + 1}: ${line.trim}"
          }
        }
      }
    } finally files.close()
    assert(offenders.isEmpty,
      "rate-defined filters outside the Panels registry (add the panel to " +
        "Panels with a literal bound, or mark an intentional corpus " +
        "fraction with a `corpus-fraction` comment):\n" +
        offenders.mkString("\n"))
  }
}
