package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: run declared queries to completion (noop sink) and dump the
  * EXECUTED plan — i.e. the AQE final plan, including ReusedExchange /
  * AQEShuffleRead nodes the initial `explain` cannot show.
  * Usage: runMain graft.ExecPlanDump <outDir> <suffix> [name ...] */
object ExecPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        spark.sparkContext.setJobDescription(s"execplan: $n")
        val df = SparkEntry.queries(n)(spark, dir)
        // Execute THIS DataFrame's own QueryExecution (a `.write` or
        // `.count()` builds a different one whose AQE plan we'd never
        // see) so the dump shows the final adaptive plan.
        val qe = df.queryExecution
        qe.toRdd.count(): Unit
        val plan = qe.executedPlan.toString
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      } catch {
        case e: Throwable =>
          System.err.println(s"EXECPLAN FAIL $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
