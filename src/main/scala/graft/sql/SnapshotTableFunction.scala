package graft.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.SnapshotTable

/** SQL time travel over [[graft.ops.SnapshotTable]] — the `VERSION AS OF`
  * surface for the SQL-first audience (VERDICT r8 next-round #8), via the
  * same `injectTableFunction` path as [[AsofTableFunction]]:
  *
  * {{{
  *   SELECT * FROM snapshot_at('/wh/core_trip_clean', 3)  -- VERSION AS OF 3
  *   SELECT * FROM snapshot_at('/wh/core_trip_clean')     -- latest version
  * }}}
  *
  * Args: table root dir (string literal), optional version (integer
  * literal; omitted = latest). The builder runs at analysis time: it
  * resolves the requested manifest and returns the exact logical plan the
  * Scala `readVersion` builds (schema inferred from the snapshot's own
  * parquet files + hive partition dirs), so SQL and Scala callers read
  * identical bytes. An unknown version or an empty table raises
  * AnalysisException listing the committed versions.
  */
object SnapshotTableFunction {

  val name = "snapshot_at"

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"snapshot_at: $msg"))

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => fail(s"$what must be a string literal, got ${other.sql}")
  }

  def build(args: Seq[Expression]): LogicalPlan = {
    if (args.isEmpty || args.size > 2)
      fail(s"expects 1 or 2 arguments (tableDir[, version]), got ${args.size}")
    val spark = SparkSession.active
    val dir = str(args.head, "tableDir")
    val version = args.lift(1).map {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType)   => v
      case other => fail(s"version must be an integer literal, got ${other.sql}")
    }
    SnapshotTable.readVersionInferred(spark, dir, version)
      .getOrElse {
        val vs = SnapshotTable(spark, dir,
          org.apache.spark.sql.types.StructType(Nil)).versions
        fail(s"no snapshot ${version.fold("(latest)")(v => s"v$v")} at $dir " +
          s"(committed versions: ${if (vs.isEmpty) "none" else vs.mkString(", ")})")
      }
      .queryExecution.logical
  }
}

/** DESCRIBE-HISTORY surface over [[graft.ops.SnapshotTable]]: one row per
  * committed version from the manifests' audit metadata — the SQL twin of
  * the Scala `history` call.
  *
  * {{{
  *   SELECT * FROM snapshot_history('/wh/core_trip_clean')
  *   -- version BIGINT, op STRING, commit_ts TIMESTAMP
  * }}}
  *
  * Manifests written before op metadata existed surface as op='unknown',
  * commit_ts NULL. A dir with no manifests raises AnalysisException (it
  * is not a snapshot table — an empty result would mask a typo'd path).
  */
object SnapshotHistoryFunction {

  val name = "snapshot_history"

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"snapshot_history: $msg"))

  def build(args: Seq[Expression]): LogicalPlan = {
    if (args.size != 1)
      fail(s"expects 1 argument (tableDir), got ${args.size}")
    val dir = args.head match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => fail(s"tableDir must be a string literal, got ${other.sql}")
    }
    val spark = SparkSession.active
    val h = SnapshotTable(spark, dir,
      org.apache.spark.sql.types.StructType(Nil)).history
    if (h.isEmpty) fail(s"no snapshot manifests at $dir")
    import spark.implicits._
    h.map(c => (c.version, c.op,
        if (c.ts > 0L) new java.sql.Timestamp(c.ts) else null))
      .toDF("version", "op", "commit_ts")
      .queryExecution.logical
  }
}
