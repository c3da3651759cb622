package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: time individual declared queries (hot session). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"run$i ${(System.nanoTime() - t0) / 1e9}%8.2f  $n rows=$c")
      }
    }
    spark.stop()
  }
}
