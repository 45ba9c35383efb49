package graft

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path => HPath}

import graft.ops.{AmbiguousCommitException, CommitCapabilityException, CommitCoordinator, ConditionalCreateCommitCoordinator, HardLinkCommitCoordinator, RenameCommitCoordinator, Snapshots}

/** The CAS contract under REAL concurrency, for every shipped
  * coordinator: N threads race distinct bodies at one target version;
  * exactly one publish may return true, the winner's bytes must
  * survive verbatim, and losers must leave no residue. This is the
  * spec that would have caught the local-filesystem clobber (Hadoop's
  * `LocalFileSystem.rename` destination refusal is userspace
  * check-then-`rename(2)`, so two racers both "won" and one committed
  * manifest silently vanished) — eleven rounds of single-writer
  * oracle runs never exercised the race, so every future coordinator
  * carries this proof.
  *
  * The hard-link coordinator races against the REAL local filesystem
  * (that is its deployment target — the kernel's `link(2)` EEXIST is
  * the primitive under test). The rename and conditional-create
  * coordinators target stores we cannot run in-process (HDFS
  * NameNode, S3/GCS conditional PUT), so they race against
  * contract-emulating wrappers whose primitives provide exactly the
  * atomic exclusivity the real store documents — proving the
  * coordinator logic (loss handling, temp cleanup, winner
  * preservation) given the primitive's contract. */
class CommitCoordinatorRaceSpec extends SparkSpec {
  import spark.implicits._

  private val Threads = 8

  private def fsOf(root: String): FileSystem =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readAll(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Race `Threads` writers at each of `rounds` targets; assert the
    * full CAS contract per round. Returns nothing — throws on any
    * violation with the round number in the message. */
  private def race(c: CommitCoordinator, fs: FileSystem, dir: String,
      rounds: Int): Unit = {
    val pool = Executors.newFixedThreadPool(Threads)
    try {
      (1 to rounds).foreach { r =>
        val target = new HPath(s"$dir/_manifests/v${"%09d".format(r)}")
        fs.mkdirs(target.getParent)
        val start = new CountDownLatch(1)
        val wins = new ConcurrentLinkedQueue[Int]()
        val errs = new ConcurrentLinkedQueue[Throwable]()
        val done = new CountDownLatch(Threads)
        (1 to Threads).foreach { w =>
          pool.execute { () =>
            try {
              start.await()
              if (c.publish(fs, target, s"writer-$w\n".getBytes("UTF-8")))
                wins.add(w)
            } catch { case t: Throwable => errs.add(t) }
            finally done.countDown()
          }
        }
        start.countDown()
        assert(done.await(60, TimeUnit.SECONDS), s"round $r hung")
        assert(errs.isEmpty, s"round $r publish threw: ${Option(errs.peek())}")
        assert(wins.size == 1,
          s"round $r: ${wins.size} writers claimed the SAME version " +
            s"(${wins}) — a clobbered manifest loses committed rows")
        assert(readAll(fs, target) == s"writer-${wins.peek()}\n",
          s"round $r: surviving bytes are not the winner's")
      }
      // no resurrection: losers' temps must all be gone
      val residue = fs.listStatus(new HPath(s"$dir/_manifests"))
        .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
      assert(residue.isEmpty, s"temp residue: ${residue.take(5).toSeq}")
    } finally { pool.shutdownNow(); () }
  }

  test("hard-link coordinator: exclusive under real races on the " +
      "real local filesystem") {
    val dir = Files.createTempDirectory("graft_race_hl").toFile.toString
    // 200 rounds × 8 threads — the check-then-rename hole this
    // coordinator replaces double-won ~95% of two-thread trials, so
    // a surviving hole would fail here with near certainty
    race(HardLinkCommitCoordinator, fsOf(dir), dir, rounds = 200)
  }

  test("rename coordinator: exclusive given a store whose rename " +
      "refuses an existing destination atomically (the HDFS contract)") {
    val dir = Files.createTempDirectory("graft_race_rn").toFile.toString
    val lock = new Object
    val hdfsLike = new FilterFileSystem(fsOf(dir)) {
      // the NameNode's namespace lock: destination check + rename as
      // one atomic step — exactly what HDFS documents and local lacks
      override def rename(src: HPath, dst: HPath): Boolean =
        lock.synchronized { if (exists(dst)) false else super.rename(src, dst) }
    }
    race(RenameCommitCoordinator, hdfsLike, dir, rounds = 60)
  }

  test("conditional-create coordinator: exclusive given a store whose " +
      "create-if-absent is atomic (the If-None-Match / " +
      "ifGenerationMatch(0) contract)") {
    val dir = Files.createTempDirectory("graft_race_cc").toFile.toString
    val lock = new Object
    val storeLike = new FilterFileSystem(fsOf(dir)) {
      override def create(f: HPath, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream =
        lock.synchronized {
          if (!overwrite && exists(f))
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              f.toString)
          super.create(f, overwrite)
        }
    }
    race(ConditionalCreateCommitCoordinator, storeLike, dir, rounds = 60)
  }

  /** A local-FS wrapper that PRESENTS as an object store: `scheme://
    * bucket` uri plus its own Hadoop conf — what the capability gate
    * sees on a real deployment, minus the network. */
  private def storePresenting(scheme: String, bucket: String,
      conf: org.apache.hadoop.conf.Configuration,
      local: FileSystem): FileSystem =
    new FilterFileSystem(local) {
      override def getUri: java.net.URI =
        java.net.URI.create(s"$scheme://$bucket")
      override def getConf: org.apache.hadoop.conf.Configuration = conf
    }

  test("capability gate: a stock s3a configuration refuses loudly " +
      "instead of committing without exclusivity") {
    ConditionalCreateCommitCoordinator.clearVerified()
    val dir = Files.createTempDirectory("graft_cap_s3").toFile.toString
    val local = fsOf(dir)
    val bare = new org.apache.hadoop.conf.Configuration(false)
    val target = new HPath(s"$dir/_manifests/v000000001")
    local.mkdirs(target.getParent)
    val e = intercept[CommitCapabilityException] {
      ConditionalCreateCommitCoordinator.publish(
        storePresenting("s3a", "bucket-stock", bare, local),
        target, "body\n".getBytes("UTF-8"))
    }
    // the operator must learn exactly which flag to set
    assert(e.getMessage.contains("fs.s3a.create.conditional.enabled"))
    assert(!local.exists(target), "a refused publish must write nothing")
    // an explicitly DISABLED GCS conflict check refuses too
    val gsOff = new org.apache.hadoop.conf.Configuration(false)
    gsOff.setBoolean("fs.gs.create.items.conflict.check.enable", false)
    val g = intercept[CommitCapabilityException] {
      ConditionalCreateCommitCoordinator.publish(
        storePresenting("gs", "bucket-gcs", gsOff, local),
        target, "body\n".getBytes("UTF-8"))
    }
    assert(g.getMessage.contains("fs.gs.create.items.conflict.check.enable"))
  }

  test("capability gate: the verified s3a flag (and the explicit " +
      "assume key) let the race contract proceed") {
    ConditionalCreateCommitCoordinator.clearVerified()
    val lock = new Object
    // the atomicity MUST live on the same wrapper publish talks to:
    // only the (Path, Boolean) create overload is overridden, and a
    // nested FilterFileSystem would route around it via the full-arg
    // delegate chain
    def atomicStore(scheme: String, bucket: String,
        conf: org.apache.hadoop.conf.Configuration,
        local: FileSystem): FileSystem = new FilterFileSystem(local) {
      override def getUri: java.net.URI =
        java.net.URI.create(s"$scheme://$bucket")
      override def getConf: org.apache.hadoop.conf.Configuration = conf
      override def create(f: HPath, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream =
        lock.synchronized {
          if (!overwrite && exists(f))
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              f.toString)
          super.create(f, overwrite)
        }
    }
    val flagged = new org.apache.hadoop.conf.Configuration(false)
    flagged.setBoolean("fs.s3a.create.conditional.enabled", true)
    val dir = Files.createTempDirectory("graft_cap_ok").toFile.toString
    race(ConditionalCreateCommitCoordinator,
      atomicStore("s3a", "bucket-flagged", flagged, fsOf(dir)),
      dir, rounds = 20)
    // a custom endpoint asserted via the escape hatch also passes
    val assumed = new org.apache.hadoop.conf.Configuration(false)
    assumed.setBoolean(
      ConditionalCreateCommitCoordinator.AssumeCapabilityKey, true)
    val dir2 = Files.createTempDirectory("graft_cap_as").toFile.toString
    race(ConditionalCreateCommitCoordinator,
      atomicStore("s3a", "bucket-assumed", assumed, fsOf(dir2)),
      dir2, rounds = 10)
  }

  test("ambiguous commits auto-resolve: landed-then-failed reads back " +
      "as WON, racer-owned as clean LOSS, absent stays ambiguous") {
    val dir = Files.createTempDirectory("graft_amb").toFile.toString
    val local = fsOf(dir)
    val mine = "mine-unique-body\n".getBytes("UTF-8")
    val theirs = "racing-winner-body\n".getBytes("UTF-8")
    // emulate a post-handoff failure with outcome `land`: the body
    // (ours, a racer's, or nothing) is at the target when close throws
    def failingAfterHandoff(land: Option[Array[Byte]]): FileSystem =
      new FilterFileSystem(local) {
        override def create(f: HPath, overwrite: Boolean)
            : org.apache.hadoop.fs.FSDataOutputStream = {
          land.foreach { bytes =>
            val out = local.create(f, false)
            try out.write(bytes) finally out.close()
          }
          new org.apache.hadoop.fs.FSDataOutputStream(
            new java.io.ByteArrayOutputStream(), null) {
            override def close(): Unit =
              throw new java.io.IOException("connection reset mid-PUT")
          }
        }
      }
    def target(n: Int) = {
      val t = new HPath(s"$dir/_manifests/amb$n")
      local.mkdirs(t.getParent); t
    }
    // (1) the handed-off PUT actually landed: read-back proves WE won
    assert(CommitCoordinator.publishResolving(
      ConditionalCreateCommitCoordinator,
      failingAfterHandoff(Some(mine)), target(1), mine))
    // (2) a racing writer owns the version: a provable clean loss —
    // the commit loop retries at the next version, no operator page
    assert(!CommitCoordinator.publishResolving(
      ConditionalCreateCommitCoordinator,
      failingAfterHandoff(Some(theirs)), target(2), mine))
    assert(readAll(local, target(2)) == "racing-winner-body\n",
      "resolution must never disturb the winner's manifest")
    // (3) nothing at the target: the PUT may still be in flight —
    // only this case surfaces to the operator
    intercept[AmbiguousCommitException] {
      CommitCoordinator.publishResolving(
        ConditionalCreateCommitCoordinator,
        failingAfterHandoff(None), target(3), mine)
    }
  }

  test("end-to-end: N writers × M appends each through the default " +
      "local coordinator commit exactly N·M rows and N·M versions") {
    val root = Files.createTempDirectory("graft_race_e2e")
      .toFile.toString + "/t"
    val writers = 4
    val appendsEach = 8
    val pool = Executors.newFixedThreadPool(writers)
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val done = new CountDownLatch(writers)
    val start = new CountDownLatch(1)
    (1 to writers).foreach { w =>
      pool.execute { () =>
        try {
          start.await()
          (1 to appendsEach).foreach { i =>
            Snapshots.append(
              Seq((w.toLong * 1000 + i, s"w$w-$i")).toDF("id", "v"), root)
          }
        } catch { case t: Throwable => errs.add(t) }
        finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(300, TimeUnit.SECONDS), "writers hung")
    pool.shutdownNow()
    assert(errs.isEmpty, s"append failed: ${Option(errs.peek())}")
    val n = writers * appendsEach
    // every commit landed under its own version: a lost-commit CAS
    // hole shows up here as fewer versions or fewer rows
    assert(Snapshots.versions(spark, root) == (1 to n),
      "versions not contiguous — a commit was lost or doubled")
    assert(Snapshots.read(spark, root).count() == n.toLong)
    assert(Snapshots.read(spark, root).select("id").distinct().count()
      == n.toLong)
  }
}
