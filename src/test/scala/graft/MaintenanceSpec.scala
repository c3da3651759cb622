package graft

import org.apache.spark.sql.functions._

import graft.batch.Maintenance

/** Harness utilities: single-file snappy publish with md5 manifest, and
  * unknown-member seeding. */
class MaintenanceSpec extends SparkSpec {

  test("compactDir: many part files collapse, rows byte-identical, idempotent") {
    import spark.implicits._
    val dir = tmpDir("graft_compact") + "/p_date=2024-01-01"
    val df = (1 to 5000).map(i => (i.toLong, s"payload$i")).toDF("id", "s")
    df.repartition(16).write.parquet(dir)
    def partFiles = new java.io.File(dir).listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(partFiles == 16)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted
    val r = Maintenance.compactDir(spark, dir, targetFileBytes = 1L << 30)
    assert(r.compacted && r.filesBefore == 16 && r.filesAfter == 1, s"$r")
    assert(partFiles == 1, "one data file after compaction")
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq, "rows survive the rewrite unchanged")
    // second sweep is a no-op — the scheduled-compactor contract
    val r2 = Maintenance.compactDir(spark, dir, targetFileBytes = 1L << 30)
    assert(!r2.compacted && r2.filesBefore == 1 && r2.filesAfter == 1)
    // no staging residue
    val names = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!names.exists(_.contains("_compact")), s"staging dirs cleaned: ${names.toSeq}")
  }

  test("publishSingleFile: one snappy part + matching md5 manifest") {
    import spark.implicits._
    val out = tmpDir("graft_publish") + "/pub"
    val df = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    val (name, md5) = Maintenance.publishSingleFile(spark, df, out)
    assert(name == "data.snappy.parquet" && md5.matches("[0-9a-f]{32}"))
    // re-readable, complete, and exactly one data file
    val back = spark.read.parquet(s"$out/$name")
    assert(back.count() == 1000)
    val manifest = scala.io.Source.fromFile(s"$out/manifest.md5").mkString
    assert(manifest.startsWith(md5) && manifest.contains(name))
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.count(_.endsWith(".parquet")) == 1)
    // manifest md5 matches the bytes on disk
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/$name"))
    val actual = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(actual == md5)
  }

  test("retentionPurge drops old date partitions, keeps recent + null, counts rows") {
    import spark.implicits._
    val t = graft.ops.ParquetTable(spark, tmpDir("graft_purge") + "/t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, p_date STRING"),
      Seq("p_date"))
    t.append(Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-10"),
      (4L, "2024-01-20"), (5L, null)).toDF("id", "p_date"))
    val res = Maintenance.retentionPurge(t, keepDays = 10,
      today = java.time.LocalDate.parse("2024-01-25"))
    assert(res.cutoffDate == java.time.LocalDate.parse("2024-01-15"))
    assert(res.rowsDeleted == 3 && res.partitionsDropped.toSet ==
      Set("2024-01-01", "2024-01-10"))
    // recent and null-dated partitions survive; purged rows are gone
    val left = t.read.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(left == Set(4L, 5L))
    // keepDays guard mirrors the proc's RAISERROR
    intercept[IllegalArgumentException] {
      Maintenance.retentionPurge(t, 0, java.time.LocalDate.parse("2024-01-25"))
    }
  }

  test("retentionPurge count and drop agree on non-ISO partition values") {
    import spark.implicits._
    val t = graft.ops.ParquetTable(spark, tmpDir("graft_purge_iso") + "/t",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, p_date STRING"),
      Seq("p_date"))
    // '2024-1-2' is Spark-castable to DATE but strict ISO parse rejects it:
    // it must count for NEITHER the row count nor the drop
    t.append(Seq(
      (1L, "2024-01-01"), (2L, "2024-1-2"), (3L, "2024-01-20"))
      .toDF("id", "p_date"))
    val res = Maintenance.retentionPurge(t, keepDays = 10,
      today = java.time.LocalDate.parse("2024-01-25"))
    assert(res.partitionsDropped == Seq("2024-01-01"))
    assert(res.rowsDeleted == 1, "count derives from the same selection as the drop")
    assert(t.read.count() == 2, "non-ISO partition kept, and not counted as deleted")
  }

  test("vacuumOrphans: dry run reports, real run deletes only unreferenced data files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vacuum").toString
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val real = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("part-")).toSet
    // a killed writer's leftovers + a stray tmp; _SUCCESS/manifest untouchable
    Seq("part-99999-dead-writer.snappy.parquet", "stage.tmp").foreach { n =>
      fs.create(new org.apache.hadoop.fs.Path(dir, n)).close()
    }
    val dry = Maintenance.vacuumOrphans(spark, dir, real, dryRun = true)
    assert(dry.removed.toSet == Set("part-99999-dead-writer.snappy.parquet", "stage.tmp"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "stage.tmp")),
      "dry run deletes nothing")
    val res = Maintenance.vacuumOrphans(spark, dir, real)
    assert(res.removed == dry.removed && res.kept.toSet == real)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "stage.tmp")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")),
      "non-data bookkeeping files survive the sweep")
    assert(spark.read.parquet(dir).count() == 100, "table intact after vacuum")
  }

  test("sweepCommitMarkers removes only markers below the watermark") {
    val dir = tmpDir("graft_markers")
    val commits = new org.apache.hadoop.fs.Path(s"$dir/_graft_commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(commits)
    (1L to 5L).foreach { id =>
      fs.create(new org.apache.hadoop.fs.Path(commits, s"batch-$id"), true).close()
    }
    // a non-marker file in the dir must never be touched
    fs.create(new org.apache.hadoop.fs.Path(commits, "not-a-marker"), true).close()

    val r = Maintenance.sweepCommitMarkers(spark, dir, keepBelow = 4L)
    assert(r.removed == Seq(1L, 2L, 3L) && r.kept == Seq(4L, 5L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(commits, "batch-1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(commits, "batch-4")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(commits, "not-a-marker")))

    // idempotent; and a sink with no marker dir is a clean no-op
    assert(Maintenance.sweepCommitMarkers(spark, dir, 4L).removed.isEmpty)
    val none = Maintenance.sweepCommitMarkers(spark, tmpDir("graft_nomark"), 4L)
    assert(none.kept.isEmpty && none.removed.isEmpty)
  }

  test("sweepLockEvents: age-bounded telemetry retention — old events and " +
    "staging orphans reaped, fresh rows still queryable (VERDICT r18 #2)") {
    val wh = tmpDir("graft_lockev")
    // real events through the production writer (the sweep keys on the
    // epoch-millis filename prefix that writer stamps)
    graft.lambda.LaneLock.logWarehouseEvent(spark, wh, "takeover", "n1", "old")
    graft.lambda.LaneLock.logWarehouseEvent(spark, wh, "fenced_abort", "n2", "old")
    Thread.sleep(5)
    val cut = System.currentTimeMillis()
    Thread.sleep(5)
    graft.lambda.LaneLock.logWarehouseEvent(spark, wh, "takeover", "n3", "new")
    // a crashed writer's staging orphan: created, never renamed in
    val evDir = new org.apache.hadoop.fs.Path(s"$wh/_lock_events")
    val fs = evDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(evDir,
      s".${cut - 60000}-takeover-deadbeef.json"), true).close()

    val r = Maintenance.sweepLockEvents(spark, wh, keepBelowTs = cut)
    assert(r.swept == 3 && r.kept == 1, s"got $r")
    val left = graft.lambda.LaneLock.events(spark, wh)
      .select("event", "nonce", "detail").collect()
      .map(row => (row.getString(0), row.getString(1), row.getString(2)))
    assert(left.toSeq == Seq(("takeover", "n3", "new")),
      s"post-sweep telemetry is exactly the retained window: ${left.toSeq}")

    // idempotent; a warehouse that never logged is a clean no-op
    assert(Maintenance.sweepLockEvents(spark, wh, cut) ==
      Maintenance.LockEventSweepResult(1L, 0L))
    assert(Maintenance.sweepLockEvents(spark, tmpDir("graft_noev"), cut) ==
      Maintenance.LockEventSweepResult(0L, 0L))
  }

  test("lifecycleTier: prefix-scoped age classes — hot kept, cool reported, old deleted") {
    val root = tmpDir("lifecycle")
    def mk(rel: String, ageDays: Int): java.io.File = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, "x")
      f.setLastModified(System.currentTimeMillis() - ageDays * 86400000L)
      f
    }
    val fresh = mk("streaming/part-0.parquet", 1)
    val cool = mk("streaming/part-1.parquet", 30)
    val old = mk("streaming-dlq/part-2.parquet", 120)
    val unscoped = mk("other/part-3.parquet", 500) // prefix miss → untouched
    val r = Maintenance.lifecycleTier(spark, root,
      Seq("streaming/", "streaming-dlq/"), coolAfterDays = 14,
      deleteAfterDays = 90, now = java.time.Instant.now())
    assert(r.hot == 1 && r.cool == 1, s"got $r")
    assert(r.deleted.map(_.path) == Seq("streaming-dlq/part-2.parquet"))
    assert(r.deleted.head.tier == "delete")
    assert(fresh.exists() && cool.exists() && !old.exists() && unscoped.exists())
    // idempotent: a second evaluation deletes nothing further
    val again = Maintenance.lifecycleTier(spark, root,
      Seq("streaming/", "streaming-dlq/"), 14, 90, java.time.Instant.now())
    assert(again.deleted.isEmpty && again.hot == 1 && again.cool == 1)
  }

  test("compactSnapshots folds multi-dir tables atomically; already-compact tables commit nothing") {
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("k BIGINT, part STRING")
    val multi = graft.ops.SnapshotTable(spark, tmpDir("mnt_snap_a"), schema, Seq("part"))
    multi.append(Seq((1L, "a"), (2L, "b")).toDF("k", "part"))
    multi.append(Seq((3L, "a"), (4L, "b")).toDF("k", "part"))
    val tidy = graft.ops.SnapshotTable(spark, tmpDir("mnt_snap_b"), schema)
    tidy.append(Seq((9L, "z")).toDF("k", "part"))

    val res = Maintenance.compactSnapshots(Seq("multi" -> multi, "tidy" -> tidy))
      .map(r => r.table -> r).toMap
    assert(res("multi").dirsBefore == 2 && res("multi").dirsAfter == 1)
    assert(res("multi").version == 3L, "fold committed as a new version")
    assert(multi.read.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L), "content identical")
    assert(res("tidy").dirsBefore == 1 && res("tidy").dirsAfter == 1)
    assert(res("tidy").version == 1L, "already-compact: no new version")
    assert(multi.history.last.op == "compact")
  }

  test("withUnknownMember seeds -1/UNKNOWN once (insert-if-absent)") {
    import spark.implicits._
    val dim = Seq(("v1", 1), ("v2", 2)).toDF("vendor_nk", "vendor_sk")
    val seeded = Maintenance.withUnknownMember(dim, "vendor_nk", "vendor_sk")
    assert(seeded.count() == 3)
    assert(seeded.filter(col("vendor_sk") === -1)
      .select("vendor_nk").collect()(0).getString(0) == "UNKNOWN")
    // idempotent: seeding again adds nothing
    val again = Maintenance.withUnknownMember(seeded, "vendor_nk", "vendor_sk")
    assert(again.count() == 3)
  }
}
