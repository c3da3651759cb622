package graft.security

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-table access policy: which columns are masked or removed and
  * which rows survive, for one principal's view of one table.
  *
  * Masking is deterministic sha256 over the string rendering — equal
  * values mask to equal digests, so referential integrity SURVIVES
  * masking: joins on a masked key, distinct counts, and group-bys all
  * return the same shapes as on the raw column, while the raw value is
  * unrecoverable. NULL masks to NULL (three-valued semantics intact).
  * `dropCols` is for columns that must not appear at all; `rowFilter`
  * is the row-level-security predicate. */
final case class TablePolicy(
    maskCols: Seq[String] = Nil,
    dropCols: Seq[String] = Nil,
    rowFilter: Option[Column] = None)

/** Deny-by-default access control — the embedded-engine analog of the
  * reference's database roles, schema grants, and loader principals
  * (ref: sql/batchELT/security/001_create_schemas.sql:1-3,
  * 030_bind_loader_principal.sql:1-15). A database engine enforces
  * GRANT/DENY in its catalog; an embedded library's enforcement object
  * is the VIEW. Each grant compiles to a secured projection registered
  * under the principal's namespace (`<principal>__<table>`); a table
  * the principal was not granted simply never resolves — the same
  * failure mode as a missing GRANT, enforced by the Spark analyzer.
  *
  * Scale shape: policies are pure column projections and predicates —
  * they fuse into whole-stage codegen over the underlying scan, add no
  * shuffle, and keep filter/column pruning pushdown intact (the
  * analyzer pushes `rowFilter` and unneeded-column elimination through
  * the view like any other subquery). */
object AccessPolicy {

  /** Applies one policy: row filter first (so masked columns can still
    * be filtered on their raw values by the POLICY — never by the
    * reader), then masks, then drops. */
  def secure(df: DataFrame, p: TablePolicy): DataFrame = {
    val filtered = p.rowFilter.map(df.filter).getOrElse(df)
    val masked = p.maskCols.foldLeft(filtered)((d, c) =>
      d.withColumn(c, sha2(col(c).cast("string"), 256)))
    masked.drop(p.dropCols: _*)
  }

  /** Registers `<principal>__<table>` temp views for every granted
    * table. Reading any ungranted name under the namespace throws at
    * analysis — deny by default. */
  def registerPrincipal(spark: SparkSession, principal: String,
      grants: Map[String, (DataFrame, TablePolicy)]): Unit =
    grants.foreach { case (table, (df, policy)) =>
      secure(df, policy).createOrReplaceTempView(s"${principal}__$table")
    }
}
