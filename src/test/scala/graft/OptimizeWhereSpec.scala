package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Incremental OPTIMIZE contract: only predicate-touching files rewrite
  * (untouched carry BY NAME — never read), content is identical, and the
  * rewritten region's narrowed ranges immediately pay in readWhere. */
class OptimizeWhereSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ow").toFile.toString + "/t"

  test("rewrites only the matching region; untouched files carry by name") {
    val root = freshRoot()
    // three disjoint key-range commits, the middle one scattered
    Snapshots.append((0L until 100L).map(i => (i, i * 1.0))
      .toDF("k", "v"), root)
    Snapshots.append((100L until 200L).map(i => (i, i * 1.0))
      .toDF("k", "v").repartition(6), root)
    Snapshots.append((200L until 300L).map(i => (i, i * 1.0))
      .toDF("k", "v"), root)
    val before = Snapshots.read(spark, root)
    val beforeRows = before.collect().map(_.toString).sorted.toSeq
    val beforeFiles = before.inputFiles.toSet
    val v = Snapshots.optimizeWhere(spark, root,
      col("k") >= 100L && col("k") < 200L, Seq("k", "v"), numFiles = 2)
    val after = Snapshots.read(spark, root, v)
    // content-identical
    assert(after.collect().map(_.toString).sorted.toSeq == beforeRows)
    // files OUTSIDE the region carried by name (same physical files)
    val afterFiles = after.inputFiles.toSet
    val carried = beforeFiles intersect afterFiles
    assert(carried.nonEmpty, "expected untouched files to carry")
    // files INSIDE the region were replaced (the 6 scattered parts gone)
    assert((beforeFiles -- afterFiles).nonEmpty)
    // and the re-clustered region now prunes: a narrow read inside it
    // opens at most the 2 new files
    val (kept, _) = Snapshots.pruneFiles(spark, root,
      col("k") === 150L, v)
    assert(kept.size <= 2,
      s"expected a narrow footprint, got ${kept.size} files: $kept")
  }

  test("no matching files is a no-op returning the base version") {
    val root = freshRoot()
    Snapshots.append((0L until 10L).map(i => (i, i * 1.0))
      .toDF("k", "v"), root)
    val v0 = Snapshots.currentVersion(spark, root).get
    assert(Snapshots.optimizeWhere(spark, root, col("k") > 999L,
      Seq("k", "v"), 1) == v0)
    assert(Snapshots.currentVersion(spark, root).get == v0)
  }

  test("stale OCC token throws; history records the operation") {
    val root = freshRoot()
    Snapshots.append((0L until 10L).map(i => (i, i * 1.0))
      .toDF("k", "v"), root)
    Snapshots.optimizeWhere(spark, root, col("k") < 5L, Seq("k", "v"), 1)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.optimizeWhere(spark, root, col("k") < 5L, Seq("k", "v"), 1,
        expectedVersion = 1) // v2 exists: the CAS on v2 must lose
    }
    assert(Snapshots.history(spark, root).orderBy(col("version").desc)
      .head().getString(2) == "optimize-where")
  }
}
