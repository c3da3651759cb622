package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute the taxi/docs warm-chain cost segment by segment
  * (raw chain stages, no Memo layer — plus the memoized chain as the
  * bench's warm() sees it, first and second touch). */
object ChainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name rows=$n")
    }
    import graft.model.TaxiModel
    t("taxi.scan")(Tables(spark, sfDir, "lineitem").count())
    t("taxi.tripsWithDups.forced")(TaxiModel.tripsWithDups(spark, sfDir)
      .select(max(col("trip_src_id")), max(col("fare_amount"))).count())
    val cleaned = TaxiModel.cleaned(
      TaxiModel.tripsWithDups(spark, sfDir), TaxiModel.paymentTypeMap(spark))
    t("taxi.cleaned.forced")(cleaned
      .select(max(col("trip_src_id")), max(col("payment_type"))).count())
    t("taxi.deduped.forced")(TaxiModel.deduped(cleaned)
      .select(max(col("trip_src_id"))).count())
    t("taxi.dims.builds") {
      graft.batch.StarModel.factFromDeduped(TaxiModel.deduped(cleaned)); 0L
    }
    t("TaxiQueries.warm") { graft.queries.TaxiQueries.warm(spark, sfDir); 0L }
    t("TaxiQueries.warm(2nd)") { graft.queries.TaxiQueries.warm(spark, sfDir); 0L }
    t("docs.scan")(Tables(spark, sfDir, "documents").count())
    t("docs.shingles.forced")(graft.docs.DocPipeline.shingleHashes(
      graft.docs.DocPipeline.documents(spark, sfDir))
      .select(max(col("h"))).count())
    t("DocQueries.warm") { graft.queries.DocQueries.warm(spark, sfDir); 0L }
    t("DocQueries.warm(2nd)") { graft.queries.DocQueries.warm(spark, sfDir); 0L }
    spark.stop()
  }
}
