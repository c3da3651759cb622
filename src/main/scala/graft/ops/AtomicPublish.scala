package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Capability a [[FileSystem]] adapter declares when its store offers an
  * ATOMIC create-if-absent with content — the object-store conditional
  * PUT (HTTP `If-None-Match: *`; S3 conditional writes, Azure Blob/ADLS
  * ETag preconditions, GCS `ifGenerationMatch=0` — all public API
  * surface). Both the existence decision AND the content must be atomic:
  * a racer never wins over an existing object, and a reader never
  * observes a half-written one (a real PUT is all-or-nothing).
  *
  * A deployment's store adapter implements this over its SDK call;
  * [[AtomicPublish]] auto-detects it and routes every publish through
  * [[putIfAbsent]]/[[put]] instead of rename — the rename path is
  * UNSOUND on stores whose rename is copy+delete or silently replaces
  * (see [[AtomicPublish.strategyFor]]).
  */
trait ConditionalPut {

  /** Atomically create `target` with `content` iff `target` is absent.
    * @return true = created (this publisher won); false = already exists */
  def putIfAbsent(target: Path, content: Array[Byte]): Boolean

  /** Unconditional atomic replace: `target` transitions old-content →
    * new-content without ever reading as ABSENT (a plain object PUT).
    * Used by maintenance writes that must keep a decided slot occupied
    * ([[SnapshotTable.vacuum]] tombstones). */
  def put(target: Path, content: Array[Byte]): Unit
}

/** The one cross-scheme atomic publish-no-overwrite primitive, shared by
  * the snapshot manifest commit ([[SnapshotTable]]) and the lane lock
  * ([[graft.lambda.LaneLock]]).
  *
  * Contract: `target` is created with `tmp`'s content iff `target` does
  * not already exist, and the existence check is ATOMIC with the create —
  * two racers publishing the same target see exactly one winner, and the
  * loser never damages the winner's file. On a win the temp name is
  * consumed; on a loss it is left for the caller to delete (the caller
  * usually re-derives and re-publishes under a new name).
  *
  * Scheme dispatch is a PLUGGABLE STRATEGY (VERDICT r16 #1), resolved
  * once per publish by [[strategyFor]]:
  *
  *  - `file` → POSIX `link(2)`: EEXIST is kernel-atomic, whereas
  *    `rename(2)` silently REPLACES an existing target, so a
  *    check-then-rename would let a race loser destroy the winner;
  *  - `hdfs`/`viewfs` → `FileContext.rename(..., Options.Rename.NONE)`:
  *    namenode-side atomic no-overwrite rename;
  *  - any [[FileSystem]] implementing [[ConditionalPut]] → the
  *    conditional-PUT strategy (object stores: the atomic primitive is
  *    the PUT precondition, not rename — S3/ABFS "rename" is copy+delete
  *    or a non-atomic metadata walk and MUST NOT carry the CAS);
  *  - anything else → [[register]]-ed strategy for its scheme, or a LOUD
  *    `UnsupportedOperationException`. Failing loudly is the point: a
  *    store that cannot honor the contract must be rejected at table
  *    open, never silently degraded to last-writer-wins (the conformance
  *    spec drives a simulated store whose rename silently replaces —
  *    exactly the store class the old always-rename fallback would have
  *    corrupted on).
  *
  * In-place REPLACE writes (vacuum tombstones) have the adjacent but
  * different contract "never absent, transient truncation OK" — see
  * [[replaceInPlace]].
  */
object AtomicPublish {

  /** One scheme's publish-no-overwrite implementation. */
  trait Strategy {
    /** @return true = this publisher won the target slot (tmp consumed);
      *         false = target already existed (tmp left for the caller) */
    def publish(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean
  }

  /** POSIX `link(2)` — local filesystems. */
  object PosixLink extends Strategy {
    def publish(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** Server-side atomic no-overwrite rename — HDFS-class filesystems. */
  object RenameNoOverwrite extends Strategy {
    def publish(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean =
      try {
        FileContext.getFileContext(fs.getUri, conf)
          .rename(tmp, target, Options.Rename.NONE) // consumed tmp on win
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
  }

  /** Conditional PUT — object stores ([[ConditionalPut]] adapters). The
    * temp file is local staging only; the store never sees it. */
  object ConditionalPutStrategy extends Strategy {
    def publish(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean = {
      val in = fs.open(tmp)
      val content = try in.readAllBytes() finally in.close()
      val won = fs.asInstanceOf[ConditionalPut].putIfAbsent(target, content)
      if (won) fs.delete(tmp, false)
      won
    }
  }

  /** Schemes with HDFS-semantics rename (atomic `Rename.NONE`). Kept
    * deliberately narrow: an unlisted scheme must be [[register]]-ed (or
    * implement [[ConditionalPut]]), not assumed. */
  private val RenameSafeSchemes = Set("hdfs", "viewfs")

  private val registry = new ConcurrentHashMap[String, Strategy]()

  /** Deployment seam: bind a scheme to its publish strategy (e.g. an
    * `s3a` adapter routing to SDK conditional writes). An explicit
    * registration wins over auto-detection. */
  def register(scheme: String, strategy: Strategy): Unit =
    registry.put(scheme, strategy): Unit

  /** Unbind a [[register]]-ed scheme (test seam). */
  private[graft] def unregister(scheme: String): Unit =
    registry.remove(scheme): Unit

  /** Resolve the publish strategy for `fs`, or throw LOUDLY when the
    * store cannot honor the publish-no-overwrite contract. */
  def strategyFor(fs: FileSystem): Strategy = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    val registered = registry.get(scheme)
    if (registered != null) registered
    else fs match {
      case _: ConditionalPut => ConditionalPutStrategy
      case _ if scheme == "file" => PosixLink
      case _ if RenameSafeSchemes.contains(scheme) => RenameNoOverwrite
      case _ =>
        throw new UnsupportedOperationException(
          s"no atomic publish-no-overwrite strategy for filesystem scheme " +
            s"'$scheme' (${fs.getClass.getName}): the snapshot-commit / " +
            "lane-lock CAS would silently degrade to last-writer-wins. " +
            "Implement graft.ops.ConditionalPut on the FileSystem adapter " +
            "(object stores: PUT If-None-Match) or AtomicPublish.register " +
            "a strategy for the scheme.")
    }
  }

  /** Fail fast at table/lock OPEN when `fs` has no sound publish
    * strategy — before any commit protocol starts. */
  def requireSupported(fs: FileSystem): Unit = { strategyFor(fs): Unit }

  /** @return true = this publisher won the target slot */
  def publish(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean =
    strategyFor(fs).publish(fs, conf, tmp, target)

  /** Write `content` to a fresh temp name under `dir` and [[publish]] it
    * as `target`; the losing temp is cleaned up here. */
  def publishContent(fs: FileSystem, conf: Configuration, dir: Path,
                     target: Path, content: String): Boolean = {
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val won = publish(fs, conf, tmp, target)
    if (!won) fs.delete(tmp, false)
    won
  }

  /** In-place replace of an EXISTING decided slot (vacuum tombstones):
    * the file must never read as ABSENT mid-replace — a vanished slot
    * would re-open it to the publish CAS — but a transiently TRUNCATED
    * read is acceptable (readers already treat sub-[[SnapshotTable
    * .MinManifestLen]] content as retired-not-missing). Contract by leg:
    * [[ConditionalPut]] stores replace via an atomic unconditional PUT;
    * local/HDFS use overwrite-create, whose open(CREATE|TRUNC) keeps the
    * inode/entry alive throughout — a FileSystem whose overwrite-create
    * is delete-then-create must NOT take this path (route it through a
    * [[ConditionalPut]] adapter instead). */
  def replaceInPlace(fs: FileSystem, target: Path, content: Array[Byte]): Unit =
    fs match {
      case cp: ConditionalPut => cp.put(target, content)
      case _ =>
        requireSupported(fs) // same store classes the publish legs vetted
        val out = fs.create(target, true)
        try out.write(content) finally out.close()
    }
}
