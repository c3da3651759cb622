package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TaxiFunctions.hash64Id
import graft.ops.GlobalPrefixSum

/** Training-data export — the last mile of the curation pipeline: write
  * a corpus as fixed-token-budget JSONL shards (WebDataset-style layout,
  * one `shard_id=N` dir holding exactly one data file) plus the manifest
  * the downstream loader trusts.
  *
  * Shard assignment is the [[GlobalPrefixSum]] running total over doc
  * order (two passes, never a single-task window), so shards are
  * CONTIGUOUS in doc order — a loader reading shard k streams one dense
  * doc-id range. The write repartitions ON the shard id: every shard
  * lands in exactly one task (one file per dir), all shards write in
  * parallel, and no task holds more than ~one shard's budget in flight.
  *
  * The manifest carries per-shard docs/tokens/doc-range plus an
  * order-free content signature (sum of per-line sha-prefix hashes) that
  * a loader — or [[ExportSpec]] — can recompute from the landed files
  * alone to detect truncated or swapped shards.
  */
object Export {

  /** Write `docs` (doc_id, text, lang, source) under `outDir` and return
    * the manifest: shard_id, docs, tokens, first/last doc, content_sig. */
  def jsonlShards(docs: DataFrame, outDir: String,
                  tokensPerShard: Long): DataFrame = {
    val sel = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .withColumn("ws_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
    val assigned = GlobalPrefixSum
      .withRunningTotal(sel, "ws_tokens", "cum", Seq("doc_id"))
      .withColumn("shard_id", expr(s"(cum - ws_tokens) div $tokensPerShard"))
    // repartitionByRange, not hash repartition: hash-partitioning shard_id
    // routinely COLLIDES arbitrary shards into one task, so the "one
    // shard's token budget per task" memory bound would not actually
    // hold. Ranging on shard_id alone keeps every shard whole (equal
    // keys never split → still exactly one file per shard dir) while a
    // task holds at most a contiguous ⌈shards/tasks⌉ run — ≈ one shard
    // once shard count reaches the partition count.
    assigned.select("shard_id", "doc_id", "lang", "source", "ws_tokens", "text")
      .repartitionByRange(col("shard_id"))
      .sortWithinPartitions("shard_id", "doc_id")
      .write.mode("overwrite").partitionBy("shard_id").json(outDir)
    manifestOf(assigned)
  }

  /** The manifest quantities from an assigned (doc_id, ws_tokens,
    * shard_id) frame — shared with readers re-deriving them from landed
    * files for verification. */
  def manifestOf(assigned: DataFrame): DataFrame =
    assigned
      .withColumn("line_h",
        hash64Id(concat_ws(":", col("doc_id"), col("ws_tokens"))))
      .groupBy("shard_id").agg(
        count(lit(1)).as("docs"),
        sum(col("ws_tokens")).as("tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(col("line_h")).as("content_sig"))
      .orderBy("shard_id")
}
