package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.SnapshotTable

/** Manifest-commit snapshot table: atomicity (a reader can never observe
  * a torn multi-file publish), version time travel, CAS commits, vacuum. */
class SnapshotTableSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("part", StringType)))

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "part")
  }

  private def table() = SnapshotTable(spark, tmpDir("snap"), schema)

  test("append and overwrite produce monotonically versioned snapshots") {
    val t = table()
    assert(t.read.count() == 0 && t.latestVersion.isEmpty)
    val v1 = t.append(df(1L -> "a", 2L -> "b"))
    val v2 = t.append(df(3L -> "a"))
    val v3 = t.overwrite(df(9L -> "z"))
    assert(Seq(v1, v2, v3) == Seq(1L, 2L, 3L))
    assert(t.readVersion(1).count() == 2)
    assert(t.readVersion(2).count() == 3)
    assert(t.read.select("k").collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("a reader never sees a torn publish: data files are invisible until the manifest renames in") {
    val t = table()
    t.append(df(1L -> "a", 2L -> "b"))
    // simulate the crash window of a 2-partition overwrite: data files
    // fully written, commit (manifest rename) not yet happened
    val orphan = s"${t.dir}/data/c-orphan-in-flight"
    df(100L -> "a", 200L -> "b").write.parquet(orphan)
    // reader still sees v1, exactly — not v1 plus half of the new files
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(t.latestVersion.contains(1L))
  }

  test("old versions stay readable (repeatable reads) until vacuum reaps them") {
    val t = table()
    t.append(df(1L -> "a"))
    t.overwrite(df(2L -> "b"))
    // a job planned over v1 mid-overwrite still reads v1's files
    assert(t.readVersion(1).select("k").head().getLong(0) == 1L)
    val deleted = t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(deleted.nonEmpty)
    assert(t.read.select("k").head().getLong(0) == 2L)
    assert(t.versions == Seq(2L))
  }

  test("vacuum never re-opens a committed version slot: a stalled " +
      "writer's publish into a vacuumed slot loses") {
    val t = table()
    t.append(df(1L -> "a"))    // v1
    t.overwrite(df(2L -> "b")) // v2
    t.overwrite(df(3L -> "c")) // v3
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.versions == Seq(3L), "retention semantics unchanged")
    // a writer that stalled after reading base=v1 wakes and publishes its
    // manifest as v2. If vacuum had DELETED v2's file, the slot would be
    // re-opened and this publish would "win" below the tip — a commit no
    // reader resolves, silently lost. The tombstone keeps the slot
    // decided: the publish must lose, sending the writer's CAS loop back
    // to the (moved) tip where the conflict is detected.
    val conf = spark.sparkContext.hadoopConfiguration
    val mdir = new org.apache.hadoop.fs.Path(s"${t.dir}/_manifests")
    val fs = mdir.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(mdir, ".tmp-stalled-writer.json")
    val out = fs.create(tmp, false)
    try out.write("""{"version": 2, "op": "overwrite", "ts": 0, "files": ["data/c-stalled"]}"""
      .getBytes("UTF-8")) finally out.close()
    assert(!t.casPublish(tmp, new org.apache.hadoop.fs.Path(mdir, "v00000002.json")),
      "publish into a vacuumed slot must lose")
    fs.delete(tmp, false)
    assert(t.versions == Seq(3L))
    assert(t.read.select("k").head().getLong(0) == 3L, "tip content untouched")
    // and the end-to-end writer path: a stale-base overwriteCas reports
    // the conflict instead of success
    assert(t.overwriteCas(df(9L -> "z"), expectedBase = Some(1L)).isEmpty)
  }

  test("a vacuum crash window (0-byte manifest) never resurrects a " +
      "version as a phantom empty snapshot") {
    val t = table()
    t.append(df(1L -> "a"))    // v1
    t.overwrite(df(2L -> "b")) // v2
    // simulate a vacuum killed between its in-place truncate and its
    // tombstone write: v1's manifest exists at 0 bytes. Length-based
    // retirement must treat ANYTHING below a real manifest's minimum
    // size as retired — not just the exact tombstone — or v1 would
    // reappear in `versions` reading as an EMPTY table (silently wrong
    // time travel, worse than the plain FileNotFound of a deleted file).
    val conf = spark.sparkContext.hadoopConfiguration
    val mpath = new org.apache.hadoop.fs.Path(s"${t.dir}/_manifests/v00000001.json")
    mpath.getFileSystem(conf).create(mpath, true).close() // 0 bytes
    assert(t.versions == Seq(2L), "the truncated version stays retired")
    assert(t.read.select("k").head().getLong(0) == 2L)
  }

  test("deleteWhere keeps null-condition rows (SQL DELETE semantics)") {
    val t = table()
    t.append(df(1L -> "a", 2L -> null, 3L -> "b"))
    t.deleteWhere(col("part") === "a")
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("concurrent committers: every append lands exactly once (CAS retry)") {
    val t = table()
    val threads = (1 to 4).map { i =>
      new Thread(() => { t.append(df(i.toLong -> "p")): Unit })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(t.versions == Seq(1L, 2L, 3L, 4L))
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  // ---- hive-partitioned snapshots (the hourly-merge commit shape) ----

  private def partedTable() =
    SnapshotTable(spark, tmpDir("snap_part"), schema, Seq("part"))

  test("partitioned: overwritePartitions atomically replaces only touched partitions") {
    val t = partedTable()
    val v1 = t.overwrite(df(1L -> "a", 2L -> "b", 3L -> "c"))
    // inputFiles reports the relation's whole file set (filters don't
    // prune it) — select partition b's live files by path
    val bFiles = t.read.inputFiles.filter(_.contains("/part=b/")).toSet
    assert(bFiles.nonEmpty)

    val v2 = t.overwritePartitions(df(10L -> "a", 30L -> "c"))
    assert(v2 == v1 + 1)
    val now = t.read.select("k", "part").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    assert(now == Seq(2L -> "b", 10L -> "a", 30L -> "c"))
    // the untouched partition is served by the SAME files (re-referenced,
    // never rewritten), and the pre-merge version stays readable
    assert(t.read.inputFiles.filter(_.contains("/part=b/")).toSet == bFiles)
    assert(t.readVersion(v1).select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("partitioned: a fully-written but uncommitted merge dir is invisible (torn window closed)") {
    val t = partedTable()
    t.overwrite(df(1L -> "a", 2L -> "b"))
    // the exact crash window of a 2-partition merge: all data files
    // written (both partitions), manifest publish not yet happened
    df(100L -> "a", 200L -> "b").write.partitionBy("part")
      .parquet(s"${t.dir}/data/c-inflight-merge")
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L), "reader sees the whole pre-merge table, not a mix")
  }

  test("partitioned: append accumulates commit dirs per partition; read unions them") {
    val t = partedTable()
    t.append(df(1L -> "a"))
    t.append(df(2L -> "a", 3L -> "b"))
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(t.partitions == Seq("part=a", "part=b"))
  }

  test("partitioned: purgePartitions is a metadata-only commit; vacuum reaps the files") {
    val t = partedTable()
    t.overwrite(df(1L -> "2024-01-01", 2L -> "2024-01-01", 3L -> "2024-06-01"))
    val oldFiles = t.read.inputFiles.toSet
    val (rows, dropped) = t.purgePartitions(_.exists(_ < "2024-03"))
    assert(rows == 2L && dropped == Seq("2024-01-01"))
    assert(t.read.select("k").collect().map(_.getLong(0)).toSeq == Seq(3L))
    // metadata-only: every pre-purge file still on disk (old version
    // readable) until vacuum
    val fs = new org.apache.hadoop.fs.Path(t.dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    oldFiles.foreach(f => assert(fs.exists(new org.apache.hadoop.fs.Path(f))))
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.read.select("k").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("partitioned: null partition values round-trip the hive default slot") {
    val t = partedTable()
    t.overwrite(df(1L -> null, 2L -> "kept"))
    val (rows, dropped) = t.purgePartitions(v => v.isEmpty) // drop null slot only
    assert(rows == 1L && dropped == Seq("__HIVE_DEFAULT_PARTITION__"))
    assert(t.read.select("k").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("casPublish: barrier-raced committers to ONE version slot — exactly one wins, winner's bytes survive") {
    // The old check-then-rename protocol fails this: all racers pass the
    // exists() check at the barrier, then POSIX rename(2) lets the LAST
    // renamer silently replace the winner's manifest (lost commit). The
    // link(2)-based CAS admits exactly one winner kernel-atomically.
    import org.apache.hadoop.fs.Path
    val t = table()
    val fs = new Path(t.dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"${t.dir}/_manifests/v99999999.json")
    fs.mkdirs(target.getParent)
    val n = 16
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val wins = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        val tmp = new Path(s"${t.dir}/_manifests/.tmp-racer-$i.json")
        val out = fs.create(tmp, false)
        try out.write(s"""{"racer": $i}""".getBytes("UTF-8")) finally out.close()
        barrier.await() // maximal contention: all publish at once
        val won = t.casPublish(tmp, target)
        if (!won) fs.delete(tmp, false)
        wins.put(i, won): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val winners = (0 until n).filter(wins.get(_))
    assert(winners.size == 1, s"exactly one CAS winner, got $winners")
    val body = {
      val in = fs.open(target)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(body == s"""{"racer": ${winners.head}}""",
      "the surviving manifest is the winner's, not a later overwriter's")
    fs.delete(target, false): Unit
  }

  // ---- compaction + history ----

  test("compact folds multi-dir snapshots to one commit dir; content identical; old versions readable") {
    val t = partedTable()
    t.append(df(1L -> "a", 2L -> "b"))
    t.append(df(3L -> "a"))
    t.append(df(4L -> "a", 5L -> "b"))
    assert(t.liveCommitDirs == 3)
    val before = t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq
    val v = t.compact()
    assert(v == 4L)
    assert(t.liveCommitDirs == 1, "every multi-dir partition folded into the one rewrite dir")
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq == before,
      "compaction is a logical no-op on content")
    // each compacted partition is one file now
    Seq("a", "b").foreach { p =>
      assert(t.read.inputFiles.count(_.contains(s"/part=$p/")) == 1)
    }
    // pre-compaction version still readable until vacuum
    assert(t.readVersion(3).select("k").collect().map(_.getLong(0)).sorted.toSeq == before)
    t.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq == before)
  }

  test("compact leaves single-dir portions untouched (no needless rewrite)") {
    val t = partedTable()
    t.append(df(1L -> "a", 9L -> "c"))
    t.append(df(2L -> "a"))
    val cFiles = t.read.inputFiles.filter(_.contains("/part=c/")).toSet
    t.compact()
    assert(t.read.inputFiles.filter(_.contains("/part=c/")).toSet == cFiles,
      "partition c (one dir) keeps its original files — only part=a was rewritten")
    val un = table()
    un.append(df(1L -> "x"))
    assert(un.compact() == 1L, "single-dir unpartitioned table: compact is a no-op, no new version")
  }

  test("compact sizes the rewrite by bytes: a huge partition splits " +
      "across files instead of serializing into one writer") {
    val s = spark
    import s.implicits._
    spark.conf.set("spark.graft.compact.targetFileBytes", "4096")
    try {
      // partitioned: part=a is ~40x the 4 KiB target across two commit
      // dirs, part=b is tiny — the fold must split a and keep b at one file
      val t = SnapshotTable(spark, tmpDir("snap_sized"), schema, Seq("part"))
      def bulk(lo: Long, n: Long) = spark.range(lo, lo + n)
        .select(col("id").as("k"), lit("a").as("part"))
      t.append(bulk(0L, 20000L).unionByName(df(1000000L -> "b")))
      t.append(bulk(20000L, 20000L))
      val before = t.read.select("k").as[Long].collect().sorted.toSeq
      t.compact()
      assert(t.liveCommitDirs == 2, "a's rewrite dir + b's untouched original")
      val aFiles = t.read.inputFiles.count(_.contains("/part=a/"))
      assert(aFiles > 1, s"oversized partition split across files (got $aFiles)")
      assert(t.read.inputFiles.count(_.contains("/part=b/")) == 1,
        "tiny partition stays one file")
      assert(t.read.select("k").as[Long].collect().sorted.toSeq == before,
        "sized compaction is a logical no-op on content")

      // unpartitioned: multi-dir fold of ~40x target ends up multi-file
      val un = SnapshotTable(spark, tmpDir("snap_sized_un"), schema)
      un.append(spark.range(0L, 20000L).select(col("id").as("k"), lit("x").as("part")))
      un.append(spark.range(20000L, 40000L).select(col("id").as("k"), lit("x").as("part")))
      val beforeUn = un.read.select("k").as[Long].collect().sorted.toSeq
      un.compact()
      assert(un.liveCommitDirs == 1)
      assert(un.read.inputFiles.length > 1,
        "oversized unpartitioned fold is not pinned to one task/file")
      assert(un.read.select("k").as[Long].collect().sorted.toSeq == beforeUn)
    } finally spark.conf.unset("spark.graft.compact.targetFileBytes")
  }

  test("compact is CAS-safe: a concurrent append survives; a concurrent overwrite wins") {
    // append race: lands between the rewrite and the commit — its dir is
    // not in the fold's source set, so it survives alongside the rewrite
    val t = partedTable()
    t.append(df(1L -> "a"))
    t.append(df(2L -> "a"))
    t.compactHook(() => { t.append(df(3L -> "a")): Unit })
    assert(t.read.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L), "the racing append is not lost to the fold")

    // overwrite race: replaces the partition mid-compaction — the fold's
    // source dirs are gone at the tip, so the stale rewrite is discarded
    val t2 = partedTable()
    t2.append(df(1L -> "a"))
    t2.append(df(2L -> "a"))
    t2.compactHook(() => { t2.overwritePartitions(df(9L -> "a")): Unit })
    assert(t2.read.select("k").collect().map(_.getLong(0)).toSeq == Seq(9L),
      "the concurrent overwrite wins; the stale rewrite never resurrects replaced rows")
  }

  test("compact that loses every fold to a concurrent overwrite aborts: no version burned") {
    val t = partedTable()
    t.append(df(1L -> "a"))
    t.append(df(2L -> "a"))                       // v2: partition 'a' is multi-dir
    var tipAfterRace = -1L
    val ret = t.compactHook(() => {
      tipAfterRace = t.overwritePartitions(df(9L -> "a"))  // v3 replaces every source dir
    })
    assert(ret == tipAfterRace,
      "aborted compact returns the tip version, not a fresh one")
    assert(t.latestVersion.contains(tipAfterRace),
      "no contentless 'compact' version published after the lost race")
    assert(!t.history.exists(_.op == "compact"),
      "history shows no compact entry for the no-op")
    assert(t.read.select("k").collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("history records one op per version in commit order") {
    val t = partedTable()
    t.append(df(1L -> "a"))
    t.append(df(2L -> "a"))
    t.compact()
    t.overwritePartitions(df(3L -> "a"))
    t.dropPartitions(_ => true)
    val h = t.history
    assert(h.map(_.version) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(h.map(_.op) ==
      Seq("append", "append", "compact", "overwrite_partitions", "drop_partitions"))
    assert(h.forall(_.ts > 0L))
  }

  // ---------------- additive schema evolution (VERDICT r17 #1) ----------

  private def dfWide(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "part", "tag")
  }

  test("superset append auto-evolves: old commit dirs read NULL for the added column") {
    val t = table()
    t.append(df(1L -> "a", 2L -> "b"))              // v1: narrow shape
    t.append(dfWide((3L, "a", "x"), (4L, "b", "y"))) // v2: +tag → evolves
    val rows = t.read.select("k", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq(1L -> None, 2L -> None, 3L -> Some("x"), 4L -> Some("y")),
      "pre-evolution rows surface NULL; post-evolution rows carry values")
    assert(t.currentSchema.fieldNames.toSeq == Seq("k", "part", "tag"))
    assert(t.currentSchema("tag").nullable, "added columns are forced nullable")
    // time travel ACROSS the boundary: v1 reads its own narrower shape
    assert(t.readVersion(1).columns.toSeq == Seq("k", "part"))
    assert(t.readVersion(2).columns.toSeq == Seq("k", "part", "tag"))
  }

  test("evolveSchema is a metadata-only commit: content unchanged, later old-shape appends NULL-pad") {
    val t = table()
    t.append(df(1L -> "a"))
    val dirsBefore = t.liveCommitDirs
    val v = t.evolveSchema(StructType(schema.fields :+
      StructField("tag", StringType)))
    assert(v == 2L && t.liveCommitDirs == dirsBefore,
      "evolution rewrote no data dir")
    assert(t.history.last.op == "evolve_schema")
    // an old-shape producer keeps working: the added nullable column pads
    t.append(df(2L -> "b"))
    val rows = t.read.select("k", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq(1L -> None, 2L -> None))
    assert(t.read.columns.toSeq == Seq("k", "part", "tag"))
    // idempotent: re-evolving to the same shape burns no version
    assert(t.evolveSchema(t.currentSchema) == t.latestVersion.get)
  }

  test("evolution refuses loudly: type change, dropped column, non-nullable gap") {
    val t = table()
    t.append(df(1L -> "a"))
    val typed = intercept[IllegalArgumentException] {
      t.append(spark.range(1).select(col("id").cast("string").as("k"),
        lit("a").as("part")))
    }
    assert(typed.getMessage.contains("change type"))
    val dropped = intercept[IllegalArgumentException] {
      t.evolveSchema(StructType(Seq(StructField("k", LongType))))
    }
    assert(dropped.getMessage.contains("dropping column"))
    // an added column declared non-nullable is silently forced nullable
    // (rows predating it MUST read NULL) rather than refused
    val v = t.evolveSchema(StructType(schema.fields :+
      StructField("tag", StringType, nullable = false)))
    assert(t.schemaAt(v)("tag").nullable)
    // the write-path refusal: a DECLARED non-nullable column can never be
    // NULL-padded for an old-shape producer
    val strict = SnapshotTable(spark, tmpDir("snap_nn"), StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("part", StringType))))
    val gap = intercept[IllegalArgumentException] {
      strict.append(spark.range(1).select(lit("a").as("part")))
    }
    assert(gap.getMessage.contains("non-nullable"))
    assert(t.latestVersion.contains(2L),
      "the refusals left the table at the evolveSchema commit, nothing else")
  }

  test("partitioned evolution: overwritePartitionsCas accepts a superset, conflicts on an interleaved different evolution") {
    val t = partedTable()
    t.append(df(1L -> "a", 2L -> "b"))
    val base = t.latestVersion
    // superset merge commits and evolves in one CAS publish
    val got = t.overwritePartitionsCas(dfWide((9L, "a", "x")), base)
    assert(got.isDefined)
    val rows = t.read.select("k", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq(2L -> None, 9L -> Some("x")))
    // a DIFFERENT evolution interleaving after the base read = conflict:
    // returns None (the written dir is reaped), caller re-derives
    val base2 = t.latestVersion
    t.evolveSchema(StructType(t.currentSchema.fields :+
      StructField("other", LongType)))
    val s2 = spark
    import s2.implicits._
    val conflicted = t.overwritePartitionsCas(
      Seq((7L, "a", "y", "z")).toDF("k", "part", "tag", "extra"), base2)
    assert(conflicted.isEmpty,
      "an interleaved different evolution must not be silently narrowed away")
    // non-evolving merges ride through a schema-only tip move: the data
    // CAS checks partition file sets, which evolve_schema never touches
    val base3 = t.latestVersion
    t.evolveSchema(StructType(t.currentSchema.fields :+
      StructField("later", StringType)))
    assert(t.overwritePartitionsCas(df(5L -> "b"), base3).isDefined,
      "a metadata-only evolution does not invalidate a plain data merge")
    assert(t.read.columns.toSeq ==
      Seq("k", "part", "tag", "other", "later"))
  }

  test("compact across an evolution boundary preserves added-column values") {
    val t = partedTable()
    t.append(df(1L -> "a"))
    t.append(dfWide((2L, "a", "x")))   // evolves; partition 'a' is 2-dir
    t.compact()
    assert(t.read.inputFiles.length >= 1)
    val rows = t.read.select("k", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq(1L -> None, 2L -> Some("x")),
      "the fold reads under the evolved schema — added values survive")
  }

  test("an evolved table reopened with the old declared schema still reads every committed column") {
    val dir = tmpDir("snap_reopen")
    val t = SnapshotTable(spark, dir, schema)
    t.append(dfWide((1L, "a", "x")))   // declared narrow, first write wide
    val reopened = SnapshotTable(spark, dir, schema) // pre-evolution declared shape
    assert(reopened.read.columns.toSeq == Seq("k", "part", "tag"),
      "the committed schema is authoritative, not the constructor argument")
    assert(reopened.currentSchema("tag").nullable)
    // and the schema-less SQL/catalog entry resolves the mix too
    t.append(df(2L -> "b"))            // old-shape dir joins the snapshot
    val inferred = SnapshotTable.readVersionInferred(spark, dir, None).get
    assert(inferred.columns.toSeq == Seq("k", "part", "tag"))
    assert(inferred.count() == 2L)
  }
}
