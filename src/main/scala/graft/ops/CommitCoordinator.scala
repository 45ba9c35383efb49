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
  *      and leaves the winner's bytes untouched. The exclusivity must
  *      hold under concurrency — a check-then-act sequence that lets
  *      two racers both return true is precisely the bug class this
  *      trait exists to prevent (a clobbered manifest silently loses
  *      the other writer's committed rows).
  *   2. ATOMIC VISIBILITY: a reader either sees the complete manifest
  *      or no file — never a prefix. (Readers resolve the current
  *      version by listing `_manifests/`, so a torn manifest would be
  *      read as the table's tip.)
  *   3. NO RESURRECTION: after a false return, no bytes of the losing
  *      attempt remain visible.
  *
  * Per-scheme deployment matrix (the defaults [[CommitCoordinators]]
  * seeds; override via [[Snapshots.setCommitCoordinator]]):
  *
  *   - `file` → [[HardLinkCommitCoordinator]]. Local rename does NOT
  *     refuse an existing destination atomically: Hadoop's
  *     `LocalFileSystem`/`RawLocalFileSystem` existing-destination
  *     refusal is a userspace `exists()` check followed by `rename(2)`
  *     — which REPLACES the target. Two racers both pass the check,
  *     both rename, both return true, and one manifest silently
  *     clobbers the other (reproduced: both threads won the same
  *     target in ~95% of trials). `link(2)` fails `EEXIST` atomically
  *     in the kernel — and does so even over NFS, where it is the
  *     classic exclusive-lock primitive.
  *   - `hdfs` → [[RenameCommitCoordinator]]. The NameNode serializes
  *     rename and refuses an existing destination inside its namespace
  *     lock (the Hadoop FileSystem specification's atomicity clause is
  *     implemented server-side there) — a genuine CAS.
  *   - `s3a`/`s3`/`s3n` → [[ConditionalCreateCommitCoordinator]]. S3
  *     rename is copy+delete, not a CAS; the conditional
  *     `If-None-Match: *` PUT is (requires
  *     `fs.s3a.create.conditional.enabled=true`, Hadoop >= 3.4.1 —
  *     VERIFIED at first publish per store; an unverifiable
  *     deployment refuses with [[CommitCapabilityException]] instead
  *     of degrading to check-then-PUT).
  *   - `gs` → [[ConditionalCreateCommitCoordinator]]. GCS rename is
  *     copy+delete (NOT atomic, NOT exclusive); object creation with
  *     the `ifGenerationMatch(0)` precondition is exclusive and
  *     visible-at-close, and the GCS connector applies it on
  *     `create(path, overwrite = false)`.
  *   - `abfs`/`abfss`/`wasb`/`wasbs` → [[ConditionalCreateCommitCoordinator]].
  *     ABFS rename-refusal-of-existing-destination is not something we
  *     can cite a server-side atomicity guarantee for across HNS and
  *     flat-namespace accounts, so these schemes are GATED off the
  *     rename path; blob creation with `If-None-Match: *` is the
  *     store's documented exclusive primitive.
  *   - any other scheme → [[RenameCommitCoordinator]] as a fallback;
  *     before multi-writer use on an unlisted scheme, verify its
  *     rename semantics or register an explicit coordinator.
  *   - An external lock/commit service: implement the trait over it
  *     (the test suite proves serialization through exactly such a
  *     coordinator).
  *
  * Every coordinator's exclusivity is proven by the same race spec
  * (`CommitCoordinatorRaceSpec`): N threads race distinct bodies at
  * one target, exactly one must win, the winner's bytes survive, and
  * no temp residue remains — run against the real local filesystem
  * for the hard-link coordinator and against contract-emulating
  * filesystems for the rename/conditional-create ones.
  */
trait CommitCoordinator extends Serializable {
  def publish(fs: FileSystem, target: HPath, body: Array[Byte]): Boolean
}

object CommitCoordinator {
  /** [[CommitCoordinator.publish]] with the AMBIGUOUS outcome
    * auto-resolved where the store itself can prove it: on
    * [[AmbiguousCommitException]], read `target` back and compare
    * against the body this writer staged —
    *
    *   - target exists with THIS body's bytes → the handed-off PUT
    *     landed after all: the commit WON (true);
    *   - target exists with different bytes → a racing writer owns the
    *     version, so this store (exclusive create) provably refused
    *     ours: a clean LOSS (false), the caller retries at the next
    *     version;
    *   - target absent, or the read itself fails → still unknown — the
    *     original exception surfaces. "Absent" is deliberately NOT a
    *     loss: the failed PUT may still be in flight server-side, and
    *     returning false here would let the caller re-append the same
    *     rows while the ghost PUT later claims this version.
    *
    * Sound because commit bodies are writer-unique (manifests name
    * freshly-staged uuid files; equal bytes ⇒ equal outcome), and
    * published objects are immutable — the compare races nothing. */
  def publishResolving(c: CommitCoordinator, fs: FileSystem,
      target: HPath, body: Array[Byte]): Boolean =
    try c.publish(fs, target, body)
    catch {
      case e: AmbiguousCommitException =>
        readBack(fs, target) match {
          case Some(bytes) => java.util.Arrays.equals(bytes, body)
          case None => throw e
        }
    }

  /** The target's full content, or None when it is absent OR the read
    * failed (both leave the commit unresolvable from here). */
  private def readBack(fs: FileSystem, target: HPath): Option[Array[Byte]] =
    try {
      val st = fs.getFileStatus(target)
      val buf = new Array[Byte](st.getLen.toInt)
      val in = fs.open(target)
      try { in.readFully(0L, buf); Some(buf) } finally in.close()
    } catch { case NonFatal(_) => None }
}

/** Dot-temp write + atomic `rename` — correct ONLY where rename both
  * is atomic and refuses an existing destination server-side (HDFS:
  * the NameNode performs the destination check and the rename under
  * one namespace lock). NOT correct on local filesystems, where the
  * refusal is userspace check-then-`rename(2)` and a race clobbers
  * the target — `file://` routes to [[HardLinkCommitCoordinator]]
  * instead. The temp lives in the manifest dir itself so the rename
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

/** Dot-temp write + `link(2)` — the local-filesystem CAS. Creating a
  * hard link fails `EEXIST` atomically in the kernel when the target
  * exists, and the linked bytes are complete the instant the link
  * appears (the temp was fully written and fsynced first), so all
  * three contract clauses hold with no userspace check-then-act
  * anywhere: the kernel's link is the exclusivity check AND the
  * publication in one syscall. Works on every POSIX local filesystem
  * and over NFS (where hard-link creation is the standard atomic
  * exclusive primitive). Bypasses the Hadoop FileSystem object
  * deliberately — `LocalFileSystem.rename`'s destination refusal is
  * exactly the check-then-act hole this coordinator closes.
  *
  * Durability: the body is forced to disk (`FileChannel.force`)
  * before the link, so a power loss after publish cannot leave a
  * torn manifest at the table tip.
  *
  * On the (exotic) local filesystem without hard-link support, falls
  * back to an exclusive `O_CREAT|O_EXCL` create — still atomic
  * exclusivity, with the documented caveat that visibility is then
  * progressive (a reader could glimpse a prefix in the write window).
  */
object HardLinkCommitCoordinator extends CommitCoordinator {
  import java.nio.ByteBuffer
  import java.nio.channels.FileChannel
  import java.nio.file.{FileAlreadyExistsException, Files, Paths}
  import java.nio.file.StandardOpenOption.{CREATE_NEW, WRITE}

  override def publish(fs: FileSystem, target: HPath,
      body: Array[Byte]): Boolean = {
    val qualified = fs.makeQualified(target).toUri.getPath
    val targetPath = Paths.get(qualified)
    Files.createDirectories(targetPath.getParent)
    // early out: an existing version is a lost race, no I/O needed
    // (purely an optimization — the link below is the real check)
    if (Files.exists(targetPath)) return false
    val tmp = targetPath.getParent.resolve(
      s".tmp-${java.util.UUID.randomUUID}")
    val ch = FileChannel.open(tmp, CREATE_NEW, WRITE)
    try {
      val buf = ByteBuffer.wrap(body)
      while (buf.hasRemaining) ch.write(buf)
      ch.force(true)
    } finally ch.close()
    try {
      Files.createLink(targetPath, tmp)
      true
    } catch {
      case _: FileAlreadyExistsException => false
      case _: UnsupportedOperationException =>
        // no hard links on this fs: O_EXCL create is still an atomic
        // exclusivity check (the visibility caveat is in the scaladoc)
        try {
          val out = FileChannel.open(targetPath, CREATE_NEW, WRITE)
          try {
            val buf = ByteBuffer.wrap(body)
            while (buf.hasRemaining) out.write(buf)
            out.force(true)
          } catch {
            case t: Throwable =>
              // we OWN the target (CREATE_NEW succeeded): a partial
              // body must not stay visible as the table tip, and the
              // version must stay claimable by a retry
              try out.close() catch { case NonFatal(_) => }
              Files.deleteIfExists(targetPath)
              throw t
          } finally out.close()
          true
        } catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
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

/** The store cannot be PROVEN to apply an exclusive-create
  * precondition, so committing through
  * [[ConditionalCreateCommitCoordinator]] would silently degrade to
  * userspace check-then-PUT — the exact lost-commit class the
  * coordinator exists to prevent. Fail closed: the message names the
  * configuration to fix. */
final class CommitCapabilityException(msg: String)
  extends IllegalStateException(msg)

/** Exclusive create of the target itself — for object stores whose
  * create-if-absent is atomic AND whose objects become visible only
  * complete at close (the S3 conditional `If-None-Match: *` PUT; on
  * s3a that is `fs.s3a.create.conditional.enabled=true`, available
  * since Hadoop 3.4.1 — REQUIRED, because a plain s3a create is
  * check-then-PUT and gives no exclusivity. On GCS, creation with the
  * `ifGenerationMatch(0)` precondition). NOT correct on filesystems
  * with progressive write visibility (a reader could see a prefix);
  * those use [[HardLinkCommitCoordinator]] (local) or
  * [[RenameCommitCoordinator]] (HDFS).
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
  *     (a false would let the caller re-append the same rows). Commit
  *     call sites route through [[CommitCoordinator.publishResolving]],
  *     which settles the ambiguity by reading the target back where
  *     the store's strong read-after-write makes that proof.
  *
  * FAIL-CLOSED capability gate (checked once per (scheme, authority)
  * per process, at first publish): the exclusivity above is only as
  * real as the connector's conditional-create support, and on the most
  * common production store it is OFF by default —
  *
  *   - `s3a`/`s3`/`s3n`: a stock s3a `create(path, overwrite=false)`
  *     is a userspace exists-check + plain PUT. The conditional
  *     `If-None-Match: *` PUT requires Hadoop >= 3.4.1 AND
  *     `fs.s3a.create.conditional.enabled=true` — both are verified,
  *     and an unverifiable deployment refuses with
  *     [[CommitCapabilityException]] naming the exact flag, instead of
  *     committing without exclusivity.
  *   - `gs`: the GCS connector applies the `ifGenerationMatch(0)`
  *     precondition on non-overwrite create unless
  *     `fs.gs.create.items.conflict.check.enable` was explicitly
  *     disabled — an explicit `false` refuses.
  *   - `abfs`/`abfss`/`wasb`/`wasbs`: the Azure drivers send
  *     `If-None-Match: *` on every non-overwrite blob create (not
  *     config-gated) — relied on as documented driver behavior.
  *   - Any other scheme reaching this coordinator got here through an
  *     explicit [[graft.ops.Snapshots.setCommitCoordinator]]
  *     registration — the registration is the operator's own
  *     capability assertion.
  *
  * Escape hatch for S3-COMPATIBLE endpoints whose connector cannot
  * surface the flag: set `graft.commit.assume-conditional-create=true`
  * in the Hadoop configuration to assert the store's conditional
  * create yourself (the setting is a deliberate, auditable statement —
  * the default stays fail-closed). */
object ConditionalCreateCommitCoordinator extends CommitCoordinator {

  /** Hadoop-conf key asserting conditional-create support on a store
    * the probes below cannot verify (custom S3-compatible endpoints). */
  val AssumeCapabilityKey = "graft.commit.assume-conditional-create"
  private val S3Flag = "fs.s3a.create.conditional.enabled"
  private val GcsFlag = "fs.gs.create.items.conflict.check.enable"

  /** (scheme, authority) pairs whose capability probe passed — one
    * verification per store per process; a FAILED probe caches nothing
    * (computeIfAbsent propagates the throw), so fixing the config and
    * retrying re-probes. */
  private val verified = new ConcurrentHashMap[String, java.lang.Boolean]()

  private def hadoopAtLeast(major: Int, minor: Int, patch: Int): Boolean = {
    val parts = org.apache.hadoop.util.VersionInfo.getVersion
      .split("[^0-9]").filter(_.nonEmpty).take(3).map(_.toInt)
    val (a, b, c) = (parts.lift(0).getOrElse(0), parts.lift(1).getOrElse(0),
      parts.lift(2).getOrElse(0))
    a > major || (a == major && (b > minor || (b == minor && c >= patch)))
  }

  private def requireCapability(fs: FileSystem): Unit = {
    val uri = fs.getUri
    val scheme = Option(uri).flatMap(u => Option(u.getScheme))
      .getOrElse("").toLowerCase
    val key = scheme + "://" +
      Option(uri).flatMap(u => Option(u.getAuthority)).getOrElse("")
    verified.computeIfAbsent(key, _ => {
      val conf = fs.getConf
      if (conf != null && conf.getBoolean(AssumeCapabilityKey, false))
        java.lang.Boolean.TRUE
      else scheme match {
        case "s3a" | "s3" | "s3n" =>
          if (conf == null || !conf.getBoolean(S3Flag, false))
            throw new CommitCapabilityException(
              s"refusing to commit to $key: exclusive manifest " +
                s"publication on S3 requires the conditional " +
                s"(If-None-Match: *) PUT, and '$S3Flag' is not enabled " +
                "in this FileSystem's configuration — a plain s3a " +
                "create is a userspace exists-check + PUT, so a racing " +
                "writer's committed manifest could be silently " +
                s"clobbered. Set $S3Flag=true (Hadoop >= 3.4.1), or " +
                s"assert a compatible store via $AssumeCapabilityKey" +
                "=true, or register a lock-service coordinator " +
                "(Snapshots.setCommitCoordinator)")
          if (!hadoopAtLeast(3, 4, 1))
            throw new CommitCapabilityException(
              s"refusing to commit to $key: '$S3Flag' is set but this " +
                "process runs Hadoop " +
                s"${org.apache.hadoop.util.VersionInfo.getVersion}, and " +
                "s3a honors the flag only from 3.4.1 — older clients " +
                "silently ignore it and commit without exclusivity. " +
                s"Upgrade hadoop-aws, or assert an externally-verified " +
                s"store via $AssumeCapabilityKey=true")
          java.lang.Boolean.TRUE
        case "gs" =>
          if (conf != null && !conf.getBoolean(GcsFlag, true))
            throw new CommitCapabilityException(
              s"refusing to commit to $key: '$GcsFlag' is explicitly " +
                "disabled, which turns off the ifGenerationMatch(0) " +
                "precondition GCS exclusive create relies on — remove " +
                "the override (it defaults to enabled)")
          java.lang.Boolean.TRUE
        case _ => java.lang.Boolean.TRUE
      }
    })
  }

  /** Reset the per-store verification cache (tests). */
  private[graft] def clearVerified(): Unit = verified.clear()

  override def publish(fs: FileSystem, target: HPath,
      body: Array[Byte]): Boolean = {
    requireCapability(fs)
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

/** Per-scheme coordinator registry, pre-seeded with the deployment
  * matrix documented on [[CommitCoordinator]] (local filesystems get
  * the hard-link CAS, HDFS keeps rename, object stores get
  * conditional create). `set` overrides a scheme; unregistered
  * schemes fall back to rename — verify that scheme's rename
  * semantics before multi-writer use there. */
private[ops] object CommitCoordinators {
  @volatile private[ops] var default: CommitCoordinator =
    RenameCommitCoordinator
  private val byScheme = new ConcurrentHashMap[String, CommitCoordinator]()
  // the built-in matrix; user `set` calls replace entries
  Seq("file" -> HardLinkCommitCoordinator,
      "hdfs" -> RenameCommitCoordinator,
      "s3a" -> ConditionalCreateCommitCoordinator,
      "s3" -> ConditionalCreateCommitCoordinator,
      "s3n" -> ConditionalCreateCommitCoordinator,
      "gs" -> ConditionalCreateCommitCoordinator,
      "abfs" -> ConditionalCreateCommitCoordinator,
      "abfss" -> ConditionalCreateCommitCoordinator,
      "wasb" -> ConditionalCreateCommitCoordinator,
      "wasbs" -> ConditionalCreateCommitCoordinator)
    .foreach { case (s, c) => byScheme.put(s, c) }

  def set(scheme: String, c: CommitCoordinator): Unit =
    byScheme.put(scheme.toLowerCase, c)

  /** Restore a scheme to the built-in matrix entry (tests). */
  def clear(scheme: String): Unit = {
    byScheme.remove(scheme.toLowerCase)
    scheme.toLowerCase match {
      case "file" => byScheme.put("file", HardLinkCommitCoordinator)
      case "hdfs" => byScheme.put("hdfs", RenameCommitCoordinator)
      case s @ ("s3a" | "s3" | "s3n" | "gs" | "abfs" | "abfss" |
          "wasb" | "wasbs") =>
        byScheme.put(s, ConditionalCreateCommitCoordinator)
      case _ =>
    }
  }

  def forFs(fs: FileSystem): CommitCoordinator = {
    val scheme = Option(fs.getUri).flatMap(u => Option(u.getScheme))
      .getOrElse("file").toLowerCase
    byScheme.getOrDefault(scheme, default)
  }
}
