package graft.ops

import org.apache.spark.sql.types.{StructField, StructType}

/** Additive schema-drift resolution for [[SnapshotTable]] — the engine
  * analog of the reference staging layer's drift tolerance, which issues a
  * per-column `ALTER TABLE ADD IF NOT EXISTS` before every load so later
  * feeds can carry new columns (ref
  * `sql/batchELT/staging/stg_trip.sql:38-111`). The same contract here:
  * a column may be ADDED (nullable — rows committed before it exists read
  * NULL), never retyped or dropped in place; anything else is a full
  * rewrite and is refused loudly rather than silently coerced.
  */
object SchemaEvolution {

  /** Resolve the write schema for `incoming` against the schema currently
    * in effect, `cur`:
    *
    *  - every `incoming` column that exists in `cur` must keep its exact
    *    type — a type change is REFUSED (loud `IllegalArgumentException`);
    *  - `incoming` columns absent from `cur` are the additive drift: they
    *    are appended after `cur`'s columns, forced nullable (rows written
    *    before the column existed read NULL, so a non-nullable addition
    *    would be a lie at read time);
    *  - `cur` columns absent from `incoming` stay in the target — an
    *    old-shape producer writing after an evolution simply NULL-pads
    *    them at write ([[SnapshotTable]] `conform`), which in turn
    *    requires them nullable there.
    *
    * Returns `cur` itself (reference-equal) when nothing was added, so
    * callers can cheaply detect "no evolution needed". Column matching is
    * exact-name (case-sensitive): the snapshot layer writes what it is
    * given and never guesses at case-folding.
    */
  def additiveTarget(cur: StructType, incoming: StructType): StructType = {
    val curByName = cur.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      curByName.get(f.name).foreach { c =>
        require(c.dataType == f.dataType,
          s"schema evolution refused: column '${f.name}' would change type " +
            s"${c.dataType.simpleString} -> ${f.dataType.simpleString} — " +
            "only ADDING nullable columns evolves in place (the reference's " +
            "ADD IF NOT EXISTS contract); a type change needs a full rewrite")
      }
    }
    val added: Array[StructField] =
      incoming.fields.filterNot(f => curByName.contains(f.name))
        .map(_.copy(nullable = true))
    if (added.isEmpty) cur else StructType(cur.fields ++ added)
  }
}
