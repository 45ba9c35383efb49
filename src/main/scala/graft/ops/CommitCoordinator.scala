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

/** A commit whose outcome is UNKNOWABLE from this process: the
  * store's exclusive-create PUT failed after the body was handed off,
  * so version `target` may or may not now exist — and if it exists,
  * it may be THIS writer's bytes or a racing winner's. The only safe
  * reaction is to surface it: retrying would risk double-appending
  * the same rows, and deleting the target would risk destroying a
  * racing writer's committed manifest (breaking the delta chain). The
  * operator resolves it by reading the table tip: if the version is
  * present and carries this commit's content, the commit succeeded. */
final class AmbiguousCommitException(msg: String, cause: Throwable)
  extends RuntimeException(msg, cause)

/** Exclusive create of the target itself — for object stores whose
  * create-if-absent is atomic AND whose objects become visible only
  * complete at close (the S3 conditional `If-None-Match: *` PUT; on
  * s3a that is `fs.s3a.create.conditional.enabled=true`, available
  * since Hadoop 3.4.1 — REQUIRED, because a plain s3a create is
  * check-then-PUT and gives no exclusivity). NOT correct on
  * filesystems with progressive write visibility (a reader could see
  * a prefix); those use [[RenameCommitCoordinator]].
  *
  * Failure semantics are deliberately asymmetric:
  *
  *   - `create` refused up front (target exists / `If-None-Match`
  *     precondition observed early): a clean LOSS — return false, the
  *     commit loop re-reads the tip and retries at the next version.
  *   - `write`/`close` failed AFTER the body was handed off: on a
  *     store that enforces exclusivity at close, the outcome is
  *     ambiguous — the PUT may have landed anyway, and a RACING
  *     writer may publish this very version between our failure and
  *     any cleanup. Throw [[AmbiguousCommitException]]; NEVER delete
  *     `target` (we cannot prove we own it) and never return false
  *     (a false would let the caller re-append the same rows). */
object ConditionalCreateCommitCoordinator extends CommitCoordinator {
  override def publish(fs: FileSystem, target: HPath,
      body: Array[Byte]): Boolean = {
    val out =
      try fs.create(target, false)
      catch { case NonFatal(_) => return false }
    try { out.write(body); out.close(); true }
    catch {
      case NonFatal(e) =>
        try out.close() catch { case NonFatal(_) => }
        throw new AmbiguousCommitException(
          s"commit of $target failed after the manifest body was " +
            "handed to the store — the version may or may not have " +
            "been published, and a racing writer may own it now. " +
            "Not retrying (double-append risk) and not deleting " +
            "(could destroy a racing winner's manifest). Inspect the " +
            "table tip: if this version exists with this commit's " +
            "content, the commit succeeded.", e)
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
