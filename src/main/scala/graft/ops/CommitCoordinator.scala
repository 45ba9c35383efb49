package graft.ops

import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** How a snapshot manifest becomes version `v` of a table, exactly
  * once across racing writers — the ONE pluggable point in the commit
  * protocol. Every [[Snapshots]] commit funnels through
  * [[CommitCoordinator.publish]]; everything above it (staging, delta
  * chains, constraint pinning, OCC retries) is storage-agnostic.
  *
  * Contract for `publish(fs, target, body)`:
  *
  *   1. EXCLUSIVE: returns true iff THIS call created `target`; if the
  *      version already exists (a racing writer won), returns false
  *      and leaves the winner's bytes untouched.
  *   2. ATOMIC VISIBILITY: a reader either sees the complete manifest
  *      or no file — never a prefix. (Readers resolve the current
  *      version by listing `_manifests/`, so a torn manifest would be
  *      read as the table's tip.)
  *   3. NO RESURRECTION: after a false return, no bytes of the losing
  *      attempt remain visible.
  *
  * Deployment mapping (configured per filesystem scheme via
  * [[Snapshots.setCommitCoordinator]]):
  *
  *   - HDFS / local / ABFS / GCS: [[RenameCommitCoordinator]] (the
  *     default) — atomic rename-to-target fails if the target exists,
  *     which is exactly the CAS.
  *   - S3 with conditional writes: [[ConditionalCreateCommitCoordinator]]
  *     — relies on exclusive create-if-absent with atomic visibility
  *     at close (the `If-None-Match: *` PUT). Raw S3 rename is
  *     copy+delete and NOT a CAS; this coordinator closes the
  *     format's one documented deployment hole there.
  *   - An external lock/commit service: implement the trait over it
  *     (the test suite proves serialization through exactly such a
  *     coordinator).
  */
trait CommitCoordinator extends Serializable {
  def publish(fs: FileSystem, target: HPath, body: Array[Byte]): Boolean
}

/** Dot-temp write + atomic `rename` — correct wherever rename is
  * atomic and refuses an existing destination (HDFS, local, ABFS,
  * GCS). The temp lives in the manifest dir itself so the rename
  * never crosses a filesystem boundary. */
object RenameCommitCoordinator extends CommitCoordinator {
  override def publish(fs: FileSystem, target: HPath,
      body: Array[Byte]): Boolean = {
    val tmp = new HPath(target.getParent,
      s".tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(body) finally out.close()
    val won =
      try fs.rename(tmp, target)
      catch { case NonFatal(_) => false }
    if (!won) fs.delete(tmp, false)
    won
  }
}

/** Exclusive create of the target itself — for object stores whose
  * create-if-absent is atomic AND whose objects become visible only
  * complete at close (S3 conditional PUT). NOT correct on filesystems
  * with progressive write visibility (a reader could see a prefix);
  * those use [[RenameCommitCoordinator]]. */
object ConditionalCreateCommitCoordinator extends CommitCoordinator {
  override def publish(fs: FileSystem, target: HPath,
      body: Array[Byte]): Boolean = {
    val out =
      try fs.create(target, false)
      catch { case NonFatal(_) => return false }
    try { out.write(body); out.close(); true }
    catch {
      case NonFatal(_) =>
        try out.close() catch { case NonFatal(_) => }
        // a failed close may or may not have published on a given
        // store; fail loudly rather than guess — the commit loop
        // re-reads the current version and retries or surfaces
        try fs.delete(target, false) catch { case NonFatal(_) => }
        false
    }
  }
}

/** Per-scheme coordinator registry with a process-wide default.
  * Scheme granularity matches how deployments differ (all of `s3a://`
  * needs the conditional coordinator; `hdfs://` and `file://` keep
  * rename). */
private[ops] object CommitCoordinators {
  @volatile private[ops] var default: CommitCoordinator =
    RenameCommitCoordinator
  private val byScheme = new ConcurrentHashMap[String, CommitCoordinator]()

  def set(scheme: String, c: CommitCoordinator): Unit =
    byScheme.put(scheme.toLowerCase, c)

  def clear(scheme: String): Unit = byScheme.remove(scheme.toLowerCase)

  def forFs(fs: FileSystem): CommitCoordinator = {
    val scheme = Option(fs.getUri).flatMap(u => Option(u.getScheme))
      .getOrElse("file").toLowerCase
    byScheme.getOrDefault(scheme, default)
  }
}
