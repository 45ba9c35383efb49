package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Snapshot-table contract: commits are atomic CAS'd manifests, every
  * retained version reads back exactly, a reader pinned to a version is
  * untouchable by later commits (the isolation swaps cannot give), and
  * vacuum is the only thing that ever deletes data. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snap").toFile.toString + "/t"

  test("append/overwrite version history and time travel") {
    val root = freshRoot()
    assert(Snapshots.versions(spark, root).isEmpty)
    assert(Snapshots.append(Seq(1L, 2L).toDF("id"), root) == 1)
    assert(Snapshots.append(Seq(3L).toDF("id"), root) == 2)
    assert(Snapshots.overwrite(Seq(9L).toDF("id"), root) == 3)
    assert(Snapshots.versions(spark, root) == Seq(1, 2, 3))
    // latest = the overwrite; older versions stay readable exactly
    assert(Snapshots.read(spark, root).as[Long].collect().toSet == Set(9L))
    assert(Snapshots.read(spark, root, 2).as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    assert(Snapshots.read(spark, root, 1).as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  test("a pinned reader is isolated from later commits") {
    val root = freshRoot()
    Snapshots.append(spark.range(100).toDF(), root)
    val pinned = Snapshots.read(spark, root) // resolves v1's file list NOW
    Snapshots.overwrite(spark.range(5).toDF(), root)
    Snapshots.append(spark.range(7).toDF(), root)
    // the pinned plan still reads v1's immutable files — full old content
    assert(pinned.count() == 100)
    assert(Snapshots.read(spark, root).count() == 5 + 7)
  }

  test("interrupted-commit garbage is invisible and does not block") {
    val root = freshRoot()
    Snapshots.append(Seq(1L).toDF("id"), root)
    // plant the two crash artifacts: a dot-temp manifest (died before
    // rename) and an orphan staged data dir (died before manifest write)
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val tmp = new HPath(s"$root/_manifests/.tmp-crashed")
    val out = fs.create(tmp, false)
    out.write("data/ghost/part-0.parquet\n".getBytes("UTF-8")); out.close()
    fs.mkdirs(new HPath(s"$root/data/orphan-commit"))
    assert(Snapshots.versions(spark, root) == Seq(1)) // tmp not a version
    assert(Snapshots.read(spark, root).count() == 1) // and not read
    assert(Snapshots.append(Seq(2L).toDF("id"), root) == 2) // not blocked
    assert(Snapshots.read(spark, root).count() == 2)
  }

  test("append retries through a lost CAS race losslessly") {
    val root = freshRoot()
    Snapshots.append(Seq(1L).toDF("id"), root)
    // simulate a racing writer: steal version 2 with a manifest that
    // carries v1's files plus nothing (a no-op append by the rival)
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v1 = fs.open(new HPath(f"$root/_manifests/v${1}%09d"))
    val v1Files = scala.io.Source.fromInputStream(v1, "UTF-8").mkString
    v1.close()
    val stolen = fs.create(new HPath(f"$root/_manifests/v${2}%09d"), false)
    stolen.write(v1Files.getBytes("UTF-8")); stolen.close()
    // our append must land as v3 ON TOP of the rival's v2 file list
    assert(Snapshots.append(Seq(2L).toDF("id"), root) == 3)
    assert(Snapshots.read(spark, root).as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  test("idempotentAppend: replayed batches commit exactly once") {
    val root = freshRoot()
    assert(Snapshots.idempotentAppend(
      Seq(1L, 2L).toDF("id"), root, "ingest", batchId = 0) == Some(1))
    assert(Snapshots.idempotentAppend(
      Seq(3L).toDF("id"), root, "ingest", batchId = 1) == Some(2))
    // foreachBatch replay after a restart re-offers batch 1: skipped
    assert(Snapshots.idempotentAppend(
      Seq(3L).toDF("id"), root, "ingest", batchId = 1).isEmpty)
    // and a stale batch id below the high-water mark is also skipped
    assert(Snapshots.idempotentAppend(
      Seq(1L, 2L).toDF("id"), root, "ingest", batchId = 0).isEmpty)
    assert(Snapshots.read(spark, root).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // a second writer is independent state: its batch 0 still lands
    assert(Snapshots.idempotentAppend(
      Seq(10L).toDF("id"), root, "other-writer", batchId = 0) == Some(3))
    assert(Snapshots.read(spark, root).count() == 4)
    // batch commits interleave with plain commits without confusion
    Snapshots.append(Seq(20L).toDF("id"), root)
    assert(Snapshots.idempotentAppend(
      Seq(30L).toDF("id"), root, "ingest", batchId = 2) == Some(5))
    assert(Snapshots.read(spark, root).count() == 6)
  }

  test("vacuum deletes only unreferenced files, keeps retained versions") {
    val root = freshRoot()
    Snapshots.append(spark.range(10).toDF(), root) // v1
    Snapshots.overwrite(spark.range(20, 25).toDF(), root) // v2: v1 dead
    Snapshots.append(spark.range(30, 32).toDF(), root) // v3 = v2 + 2
    val (droppedV, deletedF) = Snapshots.vacuum(spark, root, keepVersions = 2)
    assert(droppedV == 1)
    assert(deletedF > 0) // v1's files were unreferenced by v2/v3
    assert(Snapshots.versions(spark, root) == Seq(2, 3))
    // v2's files are shared with v3 and must have survived
    assert(Snapshots.read(spark, root, 2).count() == 5)
    assert(Snapshots.read(spark, root, 3).count() == 7)
    // idempotent: nothing left to drop at the same retention
    assert(Snapshots.vacuum(spark, root, keepVersions = 2) == (0, 0))
  }
}
