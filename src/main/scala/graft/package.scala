package object graft {
  /** Driver contract: a declared query — (session, sfDir) → result. */
  type QFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
