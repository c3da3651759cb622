package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan of one declared query.
  * Usage: runMain graft.PlanOne <queryName> [sfDir] */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
