package graft

import java.net.URI
import java.nio.file.{FileAlreadyExistsException, Files, StandardCopyOption}

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import graft.ops.ConditionalPut

/** HOSTILE simulated object store (VERDICT r16 #1): a [[RawLocalFileSystem]]
  * whose `rename` SILENTLY REPLACES an existing target — the store class
  * (S3/ABFS-shaped) on which every rename-based publish-no-overwrite is
  * unsound, because a race loser's rename destroys the winner's file with
  * no error. What it DOES offer is the object-store conditional PUT
  * ([[ConditionalPut]]): atomic create-if-absent with content (If-None-
  * Match semantics), which is the primitive [[graft.ops.AtomicPublish]]'s
  * conditional-PUT strategy carries the snapshot/lock CAS on.
  *
  * The simulation keeps the CONTRACT honest with local mechanics:
  * `putIfAbsent` stages content then `link(2)`s it in — atomic in both
  * existence and content, exactly what a real PUT precondition gives —
  * and `put` is an atomic in-place move, the unconditional PUT.
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem with ConditionalPut {

  override def getScheme: String = "mockput"
  override def getUri: URI = URI.create("mockput:///")

  /** Store-API call metering (VERDICT r18 #6): conformance cases assert
    * the publish legs' COST shape — e.g. a locally-staged publish pays
    * the store exactly one conditional PUT and zero GETs — by delta. */
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    MockObjectStoreFileSystem.gets.incrementAndGet(): Unit
    super.open(f, bufferSize)
  }

  /** Object-store rename: last-writer-wins replace of files — never an
    * atomic no-overwrite. Directory renames delegate (task-commit moves
    * in Spark writers need them; the hostility under test is file-level). */
  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    if (s.isFile) {
      val d = pathToFile(dst)
      if (d.isDirectory) return super.rename(src, dst)
      Files.createDirectories(d.toPath.getParent)
      Files.move(s.toPath, d.toPath, StandardCopyOption.REPLACE_EXISTING)
      true
    } else super.rename(src, dst)
  }

  override def putIfAbsent(target: Path, content: Array[Byte]): Boolean = {
    MockObjectStoreFileSystem.condPuts.incrementAndGet(): Unit
    val d = pathToFile(target).toPath
    Files.createDirectories(d.getParent)
    val tmp = Files.createTempFile(d.getParent, ".put-", ".tmp")
    try {
      Files.write(tmp, content)
      try { Files.createLink(d, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp): Unit
  }

  override def put(target: Path, content: Array[Byte]): Unit = {
    val d = pathToFile(target).toPath
    Files.createDirectories(d.getParent)
    val tmp = Files.createTempFile(d.getParent, ".put-", ".tmp")
    Files.write(tmp, content)
    Files.move(tmp, d, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE): Unit
  }
}

object MockObjectStoreFileSystem {
  val gets = new java.util.concurrent.atomic.AtomicLong(0)
  val condPuts = new java.util.concurrent.atomic.AtomicLong(0)
}

/** The same hostile store WITHOUT the conditional-PUT capability — a
  * store that cannot honor the publish contract at all. Tables and locks
  * opened on it must fail LOUDLY, never degrade to last-writer-wins. */
class MockNoAtomicFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocknone"
  override def getUri: URI = URI.create("mocknone:///")
  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    if (s.isFile) {
      val d = pathToFile(dst)
      if (d.isDirectory) return super.rename(src, dst)
      Files.createDirectories(d.toPath.getParent)
      Files.move(s.toPath, d.toPath, StandardCopyOption.REPLACE_EXISTING)
      true
    } else super.rename(src, dst)
  }
}

/** A SECOND capability-less scheme, dedicated to the `register()` seam
  * tests: mutating the global strategy registry for `mocknone` would let
  * a concurrently-running suite's loud-rejection assertions race the
  * registered window — a dedicated scheme keeps the two test families
  * independent of suite scheduling. */
class MockRegisterSeamFileSystem extends MockNoAtomicFileSystem {
  override def getScheme: String = "mockreg"
  override def getUri: URI = URI.create("mockreg:///")
}
