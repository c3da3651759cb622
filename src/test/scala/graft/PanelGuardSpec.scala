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

  /** Walk every .scala under queries/ except Panels.scala itself. */
  private def queryFiles: Seq[java.nio.file.Path] = {
    val qdir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    assert(java.nio.file.Files.isDirectory(qdir),
      s"expected to run from the repo root; missing $qdir")
    val files = java.nio.file.Files.list(qdir)
    try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.toSeq.filter { f =>
        val n = f.getFileName.toString
        n.endsWith(".scala") && n != "Panels.scala"
      }
    } finally files.close()
  }

  /** A match is sanctioned when the matched text itself, or any of the
    * `back` source lines above its first line, carries `Panels.` or the
    * explicit `corpus-fraction` marker. */
  private def unmarkedMatches(text: String, name: String, rx: scala.util.matching.Regex,
      back: Int): Seq[String] = {
    val lines = text.split("\n", -1)
    rx.findAllMatchIn(text).toSeq.flatMap { m =>
      val lineNo = text.substring(0, m.start).count(_ == '\n') // 0-based
      val ctx = ((lineNo - back) max 0) to lineNo
      val marked = m.matched.contains("Panels.") ||
        m.matched.contains("corpus-fraction") ||
        ctx.exists(i => lines(i).contains("Panels.") ||
          lines(i).contains("corpus-fraction"))
      if (marked) None
      else Some(s"$name:${lineNo + 1}: ${lines(lineNo).trim}")
    }
  }

  test("no declared-query file introduces a rate-only % N === 0 filter outside Panels") {
    // FULL-TEXT regex, not line-based (r13 ADVICE): tolerant of a line
    // break inside the filter(...) and of the `=== lit(0)` spelling.
    // The paren alternation admits two nesting levels (col("x"),
    // size(col("t"))) so the rate term is required to sit INSIDE the
    // filter call — `when(... % 3 === 0, ...)` value synthesis (CASE
    // dirt, not a row filter) stays out of scope.
    val inner = raw"(?:[^()]|\((?:[^()]|\([^()]*\))*\))"
    val rx = (raw"(?s)\.filter\($inner*?% *\d+ *=== *(?:lit\(0\)|0)").r
    val offenders = queryFiles.flatMap { f =>
      unmarkedMatches(new String(java.nio.file.Files.readAllBytes(f)),
        f.getFileName.toString, rx, back = 2)
    }
    assert(offenders.isEmpty,
      "rate-defined filters outside the Panels registry (add the panel to " +
        "Panels with a literal bound, or mark an intentional corpus " +
        "fraction with a `corpus-fraction` comment):\n" +
        offenders.mkString("\n"))
  }

  test("no oracle SQL introduces an unbounded % N = 0 rate filter") {
    // The SQL half of the tripwire (r13 ADVICE): two of the round-13
    // identity/panel bugs lived on the ORACLE side, which the Scala
    // regex never saw. A `WHERE/AND/ON x % N = 0` in an oracle string
    // must carry an absolute id bound (`x < CAP`) on the same predicate
    // line — the stride+cap panel shape — or a `corpus-fraction` marker
    // (SQL `--` comment or Scala comment) within the 3 lines above.
    // CASE WHEN dirt is excluded by requiring the WHERE/AND/ON prefix.
    val rateRx = raw"(?i)\b(?:WHERE|AND|ON)\s+[A-Za-z_][\w.]*\s*% *\d+ *= *0".r
    val boundRx = raw"[A-Za-z_][\w.]*\s*< *\d+".r
    val offenders = queryFiles.flatMap { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f))
      val lines = text.split("\n", -1)
      unmarkedMatches(text, f.getFileName.toString, rateRx, back = 3)
        .filterNot { off =>
          // "name:LINE: text" — bounded on the same source line is fine
          val lineNo = off.split(":", 3)(1).toInt - 1
          boundRx.findFirstIn(lines(lineNo)).isDefined
        }
    }
    assert(offenders.isEmpty,
      "unbounded rate filters in oracle SQL (add an `AND x < CAP` bound " +
        "mirroring the Panels cap, or mark an intentional corpus " +
        "fraction with a `-- corpus-fraction` comment):\n" +
        offenders.mkString("\n"))
  }
}
