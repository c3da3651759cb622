package graft

import org.apache.spark.sql.SparkSession

/** Dev-only schema/read probe for the testdata tables. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      try {
        val df = Tables(spark, dir, n)
        println(s"== $n  rows=${df.count()}")
        df.printSchema()
        if (n == "events" || n == "embeddings") df.show(2, 60, vertical = true)
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
