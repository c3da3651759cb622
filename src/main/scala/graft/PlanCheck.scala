package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for scale-critical queries. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("join_fact_dims", "filter_slice", "agg_bi_measures", "dedup_minhash_lsh")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
