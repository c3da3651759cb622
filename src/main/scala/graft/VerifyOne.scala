package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only: Verify for a subset of queries — same dump format, so
  * `tools/oracle_check.py /tmp/verify_one` checks just the named ops. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val names = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "/tmp/verify_one")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Start from a clean dir: stale result dirs from earlier invocations
    // otherwise show up in oracle_check's rows-only NOTE and mislead.
    // Guard: a misconfigured SPARK_GRAFT_OUT_DIR (e.g. $HOME) must NOT be
    // recursively wiped — only /tmp paths get the full clean; anywhere
    // else we delete just the per-query subdirs we are about to rewrite.
    val root = new java.io.File(outDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (root.getCanonicalPath.startsWith("/tmp/")) { if (root.exists()) rm(root) }
    else names.foreach { n =>
      val sub = new java.io.File(root, n)
      if (sub.exists()) rm(sub)
    }
    root.mkdirs()
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
