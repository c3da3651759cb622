package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

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
  * Scheme dispatch: POSIX `link(2)` locally — EEXIST is kernel-atomic,
  * whereas `rename(2)` silently REPLACES an existing target, so a
  * check-then-rename would let a race loser destroy the winner; cluster
  * filesystems get `FileContext.rename(..., Options.Rename.NONE)`
  * (server-side atomic, throws on existing target); object-store
  * deployments swap in a conditional PUT.
  */
object AtomicPublish {

  /** @return true = this publisher won the target slot */
  def publish(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Boolean =
    if (Option(fs.getUri.getScheme).forall(_ == "file")) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        FileContext.getFileContext(fs.getUri, conf)
          .rename(tmp, target, Options.Rename.NONE) // consumed tmp on win
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
    }

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
}
