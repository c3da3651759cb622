package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.security.{AccessPolicy, TablePolicy}

class SecuritySpec extends SparkSpec {

  import spark.implicits._

  private lazy val trips = Seq(
    (1L, "V1", 10.0, "card"),
    (2L, "V1", 10.0, "cash"),
    (3L, "V2", -5.0, "card"), // filtered by row policy
    (1L, "V2", 20.0, "card")) // same id as row 1 → same mask
    .toDF("trip_id", "vendor", "fare", "payment")

  private val policy = TablePolicy(
    maskCols = Seq("trip_id"),
    dropCols = Seq("payment"),
    rowFilter = Some(col("fare") > 0))

  test("mask is deterministic and preserves referential integrity") {
    val got = AccessPolicy.secure(trips, policy)
    val rows = got.collect()
    assert(rows.length == 3, "negative-fare row filtered")
    assert(!got.columns.contains("payment"), "dropped column gone")
    val byVendor = rows.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getString(0)).toSet).toMap
    assert(byVendor("V1").size == 2, "distinct ids stay distinct masked")
    assert((byVendor("V1") & byVendor("V2")).size == 1,
      "the shared trip id masks to the SAME digest on both rows")
    assert(rows.forall(_.getString(0).matches("[0-9a-f]{64}")),
      "mask is 64-char sha256 hex, raw id unrecoverable")
  }

  test("NULL masks to NULL — three-valued semantics intact") {
    val df = Seq((Some(1L), "a"), (None, "b"))
      .toDF("trip_id", "tag")
    val got = AccessPolicy.secure(df, TablePolicy(maskCols = Seq("trip_id")))
      .collect().map(r => r.getString(1) -> Option(r.getString(0))).toMap
    assert(got("a").isDefined && got("b").isEmpty)
  }

  test("registerPrincipal: granted view resolves, ungranted denies") {
    AccessPolicy.registerPrincipal(spark, "analyst",
      Map("trips" -> (trips, policy)))
    val v = spark.sql("SELECT count(*) AS n FROM analyst__trips")
      .collect()(0).getLong(0)
    assert(v == 3, "granted view readable under the policy")
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM analyst__secrets").collect()
    }
  }

  test("policy predicates and pruning reach the scan (no shuffle, codegen-fused)") {
    val plan = AccessPolicy.secure(trips, policy)
      .select("vendor").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pure projection adds no shuffle: $plan")
  }
}
