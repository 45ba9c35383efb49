package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.ops.{CommitCoordinator, ConditionalCreateCommitCoordinator, RenameCommitCoordinator, Snapshots}

/** The pluggable commit layer: every commit funnels through the
  * scheme-routed [[CommitCoordinator]], an external coordinator can
  * serialize racing writers on a store with no atomic rename, and the
  * CAS contract (exclusive, no resurrection) holds for both shipped
  * coordinators. */
class CommitCoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cc").toFile.toString + "/t"

  private def fsOf(root: String): FileSystem =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("every commit routes through the registered coordinator") {
    val count = new AtomicInteger(0)
    val counting = new CommitCoordinator {
      override def publish(fs: FileSystem, target: HPath,
          body: Array[Byte]): Boolean = {
        count.incrementAndGet()
        RenameCommitCoordinator.publish(fs, target, body)
      }
    }
    Snapshots.setCommitCoordinator("file", counting)
    try {
      val root = freshRoot()
      Snapshots.append(Seq((1L, 2.0)).toDF("id", "v"), root)
      Snapshots.merge(spark, root, Seq((1L, 9.0)).toDF("id", "v"), Seq("id"))
      Snapshots.deleteWhere(spark, root,
        org.apache.spark.sql.functions.col("id") === 99L)
      assert(count.get() == 3) // append + merge + delete, no bypass
      assert(Snapshots.read(spark, root).head().getDouble(1) == 9.0)
    } finally Snapshots.clearCommitCoordinator("file")
  }

  test("an external lock coordinator serializes racing writers") {
    // models an external commit service on a store whose own
    // primitives give NO exclusivity: the coordinator's check-then-act
    // is racy by construction and made safe ONLY by its mutual
    // exclusion (the lock stands in for the service). Visibility must
    // still be atomic — racing READERS resolve the current version
    // concurrently, so the body lands complete-or-absent.
    val lock = new Object
    val published = new AtomicInteger(0)
    val lockCoordinator = new CommitCoordinator {
      override def publish(fs: FileSystem, target: HPath,
          body: Array[Byte]): Boolean = lock.synchronized {
        if (fs.exists(target)) false // lost: someone committed this v
        else {
          val tmp = new HPath(target.getParent,
            s".ext-${java.util.UUID.randomUUID}")
          val out = fs.create(tmp, false)
          try out.write(body) finally out.close()
          // the move provides only atomic visibility; the CAS came
          // from the lock (we already proved the target absent)
          assert(fs.rename(tmp, target))
          published.incrementAndGet()
          true
        }
      }
    }
    Snapshots.setCommitCoordinator("file", lockCoordinator)
    try {
      val root = freshRoot()
      Snapshots.append(Seq((0L, 0.0)).toDF("id", "v"), root)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 4).map { i =>
        new Thread(() =>
          try Snapshots.append(Seq((i.toLong, i * 1.0)).toDF("id", "v"), root)
          catch { case t: Throwable => errs.add(t) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"append failed: ${Option(errs.peek())}")
      // all five commits landed, serialized: v1..v5, every row present
      assert(Snapshots.versions(spark, root) == Seq(1, 2, 3, 4, 5))
      assert(Snapshots.read(spark, root).count() == 5)
      assert(published.get() >= 5) // retries may publish-fail first
    } finally Snapshots.clearCommitCoordinator("file")
  }

  test("a refusing coordinator surfaces as a loud commit failure") {
    val refuse = new CommitCoordinator {
      override def publish(fs: FileSystem, target: HPath,
          body: Array[Byte]): Boolean = false
    }
    Snapshots.setCommitCoordinator("file", refuse)
    try {
      intercept[java.util.ConcurrentModificationException] {
        Snapshots.append(Seq((1L, 2.0)).toDF("id", "v"), freshRoot())
      }
    } finally Snapshots.clearCommitCoordinator("file")
  }

  test("conditional-create coordinator: exclusive, loser leaves nothing") {
    val root = freshRoot()
    val fs = fsOf(root)
    val target = new HPath(s"$root/_manifests/v000000001")
    fs.mkdirs(target.getParent)
    assert(ConditionalCreateCommitCoordinator.publish(fs, target,
      "winner\n".getBytes("UTF-8")))
    // second publish of the same version must lose without touching
    // the winner's bytes
    assert(!ConditionalCreateCommitCoordinator.publish(fs, target,
      "loser\n".getBytes("UTF-8")))
    val in = fs.open(target)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(got == "winner\n")
  }

  test("conditional-create: a post-handoff failure throws ambiguous " +
      "and never deletes a racing winner's manifest") {
    val root = freshRoot()
    val fs = fsOf(root)
    val target = new HPath(s"$root/_manifests/v000000001")
    fs.mkdirs(target.getParent)
    // the racing writer publishes version 1 inside this writer's
    // failure window — on a store enforcing exclusivity at close,
    // both writers can be past create() at once
    val out0 = fs.create(target, false)
    try out0.write("winner\n".getBytes("UTF-8")) finally out0.close()
    // a store handle whose PUT fails after the body was handed off
    val failing = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def create(f: HPath, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream =
        new org.apache.hadoop.fs.FSDataOutputStream(
          new java.io.OutputStream {
            override def write(b: Int): Unit =
              throw new java.io.IOException("injected store failure")
          }, null)
    }
    intercept[graft.ops.AmbiguousCommitException] {
      ConditionalCreateCommitCoordinator.publish(failing, target,
        "loser\n".getBytes("UTF-8"))
    }
    // the winner's committed manifest must be untouched: deleting it
    // would break the delta chain for every reader
    val in = fs.open(target)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(got == "winner\n")
  }

  test("scheme routing: clearing restores the built-in matrix entry") {
    val root = freshRoot()
    Snapshots.setCommitCoordinator("file", ConditionalCreateCommitCoordinator)
    try Snapshots.append(Seq((1L, 1.0)).toDF("id", "v"), root)
    finally Snapshots.clearCommitCoordinator("file")
    Snapshots.append(Seq((2L, 2.0)).toDF("id", "v"), root)
    assert(Snapshots.read(spark, root).count() == 2)
    assert(Snapshots.versions(spark, root) == Seq(1, 2))
  }
}
