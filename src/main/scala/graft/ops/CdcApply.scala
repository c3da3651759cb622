package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Apply a CDC change feed to a snapshot — the ingest-side mirror of
  * `merge_upsert_key`'s warehouse merge, for sources that ship a change
  * LOG (Debezium/CDC exports, table change feeds) instead of the desired
  * end state: every change row carries an op (`I`/`U` upsert, `D`
  * delete) plus the key and ordering columns; the result is the snapshot
  * with the LAST change per key applied, deletes removed.
  *
  * Semantics (last-writer-wins):
  *  - a key's winner is its change with the highest (ordering...) value;
  *    any change outranks the snapshot row (the feed is newer than the
  *    snapshot by contract);
  *  - winner op `D` ⇒ the key disappears, even if it was re-inserted
  *    EARLIER in the feed (order decides, not op);
  *  - keys untouched by the feed pass through unchanged;
  *  - `I` vs `U` are deliberately synonymous on apply (idempotent
  *    replays of an insert must not fail) — the distinction is audit
  *    metadata, same as the reference's merge counting updates vs
  *    inserts separately.
  *
  * Scale shape: ONE shuffle — union the tagged snapshot under the tagged
  * feed, then a per-key row_number picks the winner (the same
  * union + ordered-window shape as [[AsofJoin]]; no join at all). The
  * window is per-key, so skew tracks key-update hotness, and the union
  * never widens rows beyond the value columns both sides already share.
  *
  * @param ordering change-feed ordering columns (ts, seq, ...) — must
  *                 totally order each key's changes or LWW is undefined
  */
object CdcApply {
  def apply(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
            ordering: Seq[String]): DataFrame = {
    require(changes.columns.contains("op"), "change feed needs an op column")
    val valueCols = snapshot.columns.filterNot(keys.contains)
    // snapshot rows sort below every change (_pri 0 < 1), ordering cols
    // NULL — never compared because _pri differs
    val snap = snapshot.withColumn("_pri", lit(0)).withColumn("op", lit("S"))
      .select((keys.map(col) ++ valueCols.map(col) :+ col("_pri") :+ col("op")) ++
        ordering.filterNot(snapshot.columns.contains)
          .map(c => lit(null).as(c)): _*)
    val chg = changes.withColumn("_pri", lit(1))
      .select((keys.map(col) ++ valueCols.map(col) :+ col("_pri") :+ col("op")) ++
        ordering.filterNot(c => valueCols.contains(c)).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("_pri").desc +: ordering.map(col(_).desc)): _*)
    snap.unionByName(chg, allowMissingColumns = false)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "D")
      .select(keys.map(col) ++ valueCols.map(col): _*)
  }
}
