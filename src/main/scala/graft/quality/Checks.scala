package graft.quality

import org.apache.spark.sql.DataFrame

import graft.ops.RunLog

/** Runtime DQ gating — the reference's correctness machinery (SURVEY §5):
  * evaluate checks → persist PASSED/FAILED/WARNING rows → throw on any
  * FAILED (the THROW 51000/53000/54000 pattern). */
object Checks {

  /** A named check: observed count + the rule grading it. */
  final case class Check(name: String, observed: Long,
                         grade: Long => String) {
    def status: String = grade(observed)
  }

  /** FAIL when observed > 0 (e.g. null pickups, negative fares). */
  def failIfAny(name: String, observed: Long): Check =
    Check(name, observed, n => if (n > 0) "FAILED" else "PASSED")

  /** WARN when observed > 0 (non-fatal checks). */
  def warnIfAny(name: String, observed: Long): Check =
    Check(name, observed, n => if (n > 0) "WARNING" else "PASSED")

  /** FAIL when observed == 0 (rowcount gates). */
  def failIfEmpty(name: String, observed: Long): Check =
    Check(name, observed, n => if (n == 0) "FAILED" else "PASSED")

  /** FAIL unless the predicate holds for the observed value. */
  def failUnless(name: String, observed: Long, ok: Long => Boolean): Check =
    Check(name, observed, n => if (ok(n)) "PASSED" else "FAILED")

  final class DqGateException(val code: Int, val failed: Seq[String])
    extends RuntimeException(s"DQ gate failed (code $code): ${failed.mkString(", ")}")

  /** Persist all check rows, then throw with `code` if any FAILED
    * (LogSuccess/LogFailure + THROW). Returns the statuses. */
  def gate(log: RunLog, runId: String, stage: String, code: Int,
           checks: Seq[Check]): Seq[(String, String)] = {
    log.logDq(runId, stage, checks.map(c => (c.name, c.status, c.observed)))
    val failed = checks.filter(_.status == "FAILED").map(_.name)
    if (failed.nonEmpty) {
      log.logRun(runId, stage, "FAILED", message = failed.mkString(", "))
      throw new DqGateException(code, failed)
    }
    checks.map(c => c.name -> c.status)
  }

  def count(df: DataFrame): Long = df.count()
}
