package graft

import org.apache.spark.sql.functions._

import graft.batch.Export

/** JSONL shard export: layout, manifest fidelity, and packing bounds. */
class ExportSpec extends SparkSpec {

  import spark.implicits._

  test("shards land one-file-per-dir and the manifest matches the files") {
    val out = tmpDir("graft_export")
    // 12 docs, 5 tokens each, budget 12 tokens/shard -> contiguous
    // shards of 2-3 docs
    val docs = (0L until 12L)
      .map(i => (i, s"tok$i a b c d", "en", s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
    val manifest = Export.jsonlShards(docs, out, tokensPerShard = 12L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

    // layout: each shard dir holds exactly one data file
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(dirs.length == manifest.size && dirs.nonEmpty, s"dirs: ${dirs.toSeq}")
    dirs.foreach { d =>
      val data = d.listFiles().filter(_.getName.endsWith(".json"))
      assert(data.length == 1, s"${d.getName}: one data file per shard")
    }

    // manifest fidelity: re-derive every quantity from the landed files
    val back = spark.read.json(out)
      .select(col("shard_id").cast("long").as("shard_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("ws_tokens").cast("long").as("ws_tokens"))
    assert(back.count() == 12L, "no rows lost in export")
    val rederived = Export.manifestOf(back)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rederived == manifest,
      s"files must reproduce the manifest:\n$rederived\nvs\n$manifest")

    // packing: shards are contiguous in doc order and within budget + one doc
    val ordered = manifest.toSeq.sortBy(_._1)
    ordered.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(a._4 < b._3, "shard doc ranges are contiguous and disjoint")
      case _ => ()
    }
    // a shard's token span covers one budget window; boundary docs can
    // shave up to one doc's tokens at each end
    ordered.dropRight(1).foreach { case (sid, m) =>
      assert(m._2 >= 12L - 2 * 5L && m._2 <= 12L + 5L,
        s"shard $sid tokens ${m._2} within budget ± boundary docs")
    }
    assert(ordered.length == 5, "60 tokens at budget 12 -> 5 shards")
  }
}
