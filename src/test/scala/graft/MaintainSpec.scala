package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}

import graft.ops.Snapshots

/** maintain() — the scheduled policy pass: compacts only past the file
  * threshold, retires history, reclaims aged orphans, and is a no-op on
  * a healthy table. */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_maint").toFile.toString + "/t"

  test("compacts past maxFiles, vacuums history, reaps aged orphans") {
    val root = freshRoot()
    (0 until 12).foreach(i =>
      Snapshots.append(Seq((i.toLong, i * 1.0)).toDF("id", "v"), root))
    // plant aged crash garbage
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ghost = new HPath(s"$root/data/ghost/part-0.parquet")
    val out = fs.create(ghost, false); out.write(Array[Byte](9)); out.close()
    // keepVersions=1: only the compacted full manifest survives, so the
    // pre-compact files actually die (a larger keep retains them through
    // the delta CHAIN the kept version resolves by — by design)
    val r = Snapshots.maintain(spark, root, maxFiles = 6, targetFiles = 2,
      keepVersions = 1, orphanOlderThanMs = -60000)
    assert(r.compactedTo.nonEmpty)
    assert(r.versionsDropped > 0 && r.filesDeleted > 0)
    assert(r.orphansDeleted == 1)
    // the table reads exactly, compacted to the target
    assert(Snapshots.read(spark, root).count() == 12)
    assert(Snapshots.read(spark, root).inputFiles.length <= 2)
    assert(!fs.exists(ghost))
  }

  test("healthy table: maintain is a metadata-only no-op") {
    val root = freshRoot()
    Snapshots.append((0L until 5L).map(i => (i, i * 1.0)).toDF("id", "v"),
      root)
    val v = Snapshots.currentVersion(spark, root).get
    val r = Snapshots.maintain(spark, root)
    assert(r == Snapshots.MaintainResult(None, 0, 0, 0))
    assert(Snapshots.currentVersion(spark, root).get == v)
  }
}
