package graft.table

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

/** The ONE pluggable primitive the [[GraftTable]] commit protocol
  * needs: publish a fully-written log entry at a reserved name iff
  * nothing exists there ("write-if-absent"). Everything else in the
  * format — data files, checkpoints, snapshots — tolerates plain
  * last-writer-wins IO; only the entry publish decides commit races,
  * so only it needs a per-storage atomicity story (the same
  * factoring as the published Delta `LogStore` interface):
  *
  *   - HDFS: rename-to-reserved-name is namenode-atomic →
  *     [[RenameLogStore]] (the unregistered-scheme default).
  *   - POSIX local FS: rename replaces silently, and readback
  *     verification still has a window where two racers each observe
  *     their own content — so `file` is pre-registered to
  *     [[ExclusiveCreateLogStore]], whose `link(2)` fails EEXIST
  *     atomically in the kernel.
  *   - Object stores: no atomic rename at all, but every major store
  *     HAS a conditional create (S3 `If-None-Match: *`, GCS
  *     `ifGenerationMatch=0`, Azure `If-None-Match: *`) —
  *     [[ExclusiveCreateLogStore]] is that shape: upload the full
  *     content, atomically fail if the name exists.
  *
  * Stores are selected per filesystem SCHEME via [[LogStore.register]].
  */
trait LogStore {

  /** Atomically publish `json` at `logDir/name` iff absent.
    * @return true iff THIS call created the file with this content
    *         (false = lost the race to another committer)
    */
  def writeIfAbsent(fs: FileSystem, logDir: Path, name: String,
      json: String): Boolean
}

object LogStore {

  private val byScheme = TrieMap[String, LogStore]()
  // the local FS has a TRUE write-if-absent primitive (link(2) fails
  // EEXIST atomically) — strictly stronger than rename + readback,
  // whose verification window lets two unlucky racers both observe
  // their own content; registered by default so every local table
  // commits through it
  byScheme.put("file", ExclusiveCreateLogStore)

  /** Bind `store` to every filesystem with this URI scheme (e.g.
    * register a conditional-put store for "s3a").
    */
  def register(scheme: String, store: LogStore): Unit =
    byScheme.put(scheme, store)

  /** The store for `fs` — registered by scheme, rename default. */
  def forFs(fs: FileSystem): LogStore =
    byScheme.getOrElse(fs.getScheme, RenameLogStore)

  private[table] def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private[table] def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }
}

/** Rename-based exclusive publish (the default): fully write a temp
  * file, rename it to the reserved version name. On HDFS
  * rename-to-existing fails atomically at the namenode, so the first
  * writer wins outright. On a POSIX local FS rename silently
  * replaces, leaving a small race window — the committer re-reads the
  * destination and treats a content mismatch as a lost race.
  */
object RenameLogStore extends LogStore {
  override def writeIfAbsent(fs: FileSystem, logDir: Path, name: String,
      json: String): Boolean = {
    val dst = new Path(logDir, name)
    if (fs.exists(dst)) return false
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}")
    LogStore.writeString(fs, tmp, json)
    val renamed = try fs.rename(tmp, dst) catch { case _: Exception => false }
    if (!renamed) { fs.delete(tmp, false); return false }
    // POSIX rename replaces silently; detect a lost race by content
    LogStore.readString(fs, dst) == json
  }
}

/** Conditional-create publish for object-store semantics: write the
  * full content aside, then take the reserved name with an operation
  * that ATOMICALLY fails if the name already exists — the shape of a
  * real store's conditional PUT (S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`), where the winner's object appears fully
  * formed and every loser gets a precondition failure. Backed here by
  * `link(2)` (EEXIST on a taken name, content complete at link time)
  * for any [[RawLocalFileSystem]]-derived mock such as the test
  * suite's `mocks3://`; a production s3a/gcs store implements the
  * same trait with the SDK's conditional request instead.
  */
object ExclusiveCreateLogStore extends LogStore {
  override def writeIfAbsent(fs: FileSystem, logDir: Path, name: String,
      json: String): Boolean = {
    val dst = new Path(logDir, name)
    if (fs.exists(dst)) return false // cheap fast-path, not the decider
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}")
    LogStore.writeString(fs, tmp, json)
    val raw = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem =>
        c.getRawFileSystem match {
          case r: RawLocalFileSystem => r
          case other => throw new UnsupportedOperationException(
            s"ExclusiveCreateLogStore needs a local-backed store, " +
              s"got ${other.getClass.getName}")
        }
      case r: RawLocalFileSystem => r
      case other => throw new UnsupportedOperationException(
        s"ExclusiveCreateLogStore's link(2) backing needs a local-backed " +
          s"store; ${other.getClass.getName} requires an SDK conditional put")
    }
    val won =
      try {
        java.nio.file.Files.createLink(
          raw.pathToFile(dst).toPath, raw.pathToFile(tmp).toPath)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    fs.delete(tmp, false)
    won
  }
}
