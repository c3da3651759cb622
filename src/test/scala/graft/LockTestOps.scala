package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Test-only surgery on a [[graft.lambda.LaneLock]] tip: rewrite the
  * timestamp to `now - ageMs`, preserving state, nonce and the recorded
  * holder TTL (the 4-field tip format). Shared by LaneLockSpec and
  * LambdaSpec so the tip wire format lives in exactly one test helper —
  * staleness is judged against the tip's OWN ttl, so callers must pass
  * `ageMs` greater than the holder's ttl to simulate an expired lease. */
object LockTestOps {

  def backdateTip(spark: SparkSession, whDir: String, ageMs: Long): Unit = {
    val lockDir = new Path(s"$whDir/_lane_lock.d")
    val fs = lockDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tipFile = fs.listStatus(lockDir).map(_.getPath).maxBy(_.getName)
    val txt = {
      val in = fs.open(tipFile)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val Array(state, nonce, _, ttl) = txt.trim.split("\\s+")
    fs.delete(tipFile, false)
    val out = fs.create(tipFile, false)
    out.write(s"$state $nonce ${System.currentTimeMillis() - ageMs} $ttl"
      .getBytes("UTF-8"))
    out.close()
  }
}
