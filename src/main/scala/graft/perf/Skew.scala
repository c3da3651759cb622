package graft.perf

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Skew mitigation for hot-key joins (SURVEY §4; the 100 TB failure mode
  * where one vendor/date key holds a disproportionate share of rows).
  *
  * `saltedJoin` spreads each hot left-side key over `salts` sub-keys and
  * replicates the right side once per salt — the classic salting scheme.
  * AQE's skew-join handles sort-merge cases automatically; salting is the
  * explicit fallback when the right side is too big to broadcast and the
  * skew survives AQE (e.g. aggregation-before-join pipelines). */
object Skew {

  /** Inner equi-join `left.key == right.key` with the left side's hot keys
    * salted across `salts` partitions. Result equals the plain join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedLeft = left
      .withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Deterministic variant: salt derived from a second column's hash
    * instead of rand(), so results are reproducible row-for-row. */
  def saltedJoinDeterministic(left: DataFrame, right: DataFrame, key: String,
                              saltFrom: String, salts: Int): DataFrame = {
    val saltedLeft = left
      .withColumn("_salt", pmod(hash(col(saltFrom)), lit(salts)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
