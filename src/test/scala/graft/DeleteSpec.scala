package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Delete

/** Targeted-delete contract: affected rows vanish, untouched partitions'
  * FILES are byte-identical (never rewritten or moved), a fully-deleted
  * partition's directory disappears, and re-deleting is a no-op. */
class DeleteSpec extends SparkSpec {
  import spark.implicits._

  private def fileSigs(dir: java.io.File): Set[(String, Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).map(f => (f.getPath, f.length, f.lastModified)).toSet
  }

  test("partitioned delete: only touched partitions rewritten") {
    val root = Files.createTempDirectory("graft_delete").toFile
    val path = s"$root/table"
    Seq(
      (1L, "A", 10.0), (2L, "A", 20.0),
      (3L, "B", 30.0), (4L, "B", 40.0),
      (5L, "C", 50.0), (6L, "C", 60.0)
    ).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(path)

    val cBefore = fileSigs(new java.io.File(s"$path/part=C"))
    // delete k=1 (partition A, partial) and k=3,4 (ALL of partition B)
    Delete.deleteKeysPartitioned(spark, path,
      Seq(1L, 3L, 4L).toDF("k"), Seq("k"), "part")

    val back = spark.read.parquet(path)
    assert(back.select("k").as[Long].collect().sorted.toSeq ==
      Seq(2L, 5L, 6L))
    // B was emptied: its directory is gone
    assert(!new java.io.File(s"$path/part=B").exists())
    // C was untouched: same files, same bytes, same mtimes
    assert(fileSigs(new java.io.File(s"$path/part=C")) == cBefore)

    // idempotent: the keys are gone, so nothing is touched at all
    val aAfter = fileSigs(new java.io.File(s"$path/part=A"))
    Delete.deleteKeysPartitioned(spark, path,
      Seq(1L, 3L, 4L).toDF("k"), Seq("k"), "part")
    assert(fileSigs(new java.io.File(s"$path/part=A")) == aAfter)
    assert(spark.read.parquet(path).count() == 3)
  }

  test("partition value that Hive-escapes is refused, table unmodified") {
    val root = Files.createTempDirectory("graft_delete3").toFile
    val path = s"$root/table"
    // ':' in a partition value makes Spark write an escaped dir name
    // (part=10%3A30) that the plain-toString prediction misses; before
    // the guard, the swap loop mistook that partition for fully-deleted
    // and silently dropped its SURVIVING rows. Now: throw, touch nothing.
    Seq((1L, "10:30", 1.0), (2L, "10:30", 2.0), (3L, "ok", 3.0))
      .toDF("k", "part", "v")
      .write.partitionBy("part").parquet(path)
    val before = fileSigs(new java.io.File(path))

    val ex = intercept[IllegalArgumentException] {
      // partial delete: k=1 goes, k=2 survives in the escaped partition
      Delete.deleteKeysPartitioned(spark, path,
        Seq(1L).toDF("k"), Seq("k"), "part")
    }
    assert(ex.getMessage.contains("round-trip"))
    // nothing modified, no staging/parking leftovers
    assert(fileSigs(new java.io.File(path)) == before)
    assert(!new java.io.File(s"$root/table__staging__").exists())
    assert(!new java.io.File(s"$root/table__old__").exists())
    assert(spark.read.parquet(path).count() == 3)
  }

  test("FULLY-EMPTIED escaped partition is refused too, table unmodified") {
    val root = Files.createTempDirectory("graft_delete5").toFile
    val path = s"$root/table"
    // Deleting EVERY row of the escaping partition stages no survivor
    // dir for it, so the staged-name comparison alone can never catch
    // the mismatch — the old guard passed, the swap loop probed the
    // unescaped predicted name (absent on disk), and the partition's
    // rows silently survived a right-to-be-forgotten delete. The
    // value-level round-trip guard must refuse before any write.
    Seq((1L, "a%b", 1.0), (2L, "a%b", 2.0), (3L, "ok", 3.0))
      .toDF("k", "part", "v")
      .write.partitionBy("part").parquet(path)
    val before = fileSigs(new java.io.File(path))

    val ex = intercept[IllegalArgumentException] {
      Delete.deleteKeysPartitioned(spark, path,
        Seq(1L, 2L).toDF("k"), Seq("k"), "part")
    }
    assert(ex.getMessage.contains("round-trip"))
    assert(fileSigs(new java.io.File(path)) == before)
    assert(!new java.io.File(s"$root/table__staging__").exists())
    assert(!new java.io.File(s"$root/table__old__").exists())
    assert(!new java.io.File(s"$root/table__dropped__").exists())
    assert(spark.read.parquet(path).count() == 3)
  }

  test("interrupted delete: parked-empty partition is purged, not restored") {
    val root = Files.createTempDirectory("graft_delete4").toFile
    val path = s"$root/table"
    Seq((1L, "A", 1.0), (2L, "B", 2.0)).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(path)
    // Emulate a crash after a fully-emptied partition was parked under
    // __dropped__ but before the final cleanup: B's rows were all
    // deleted, its dir renamed aside, then the process died.
    val dropped = new java.io.File(s"$root/table__dropped__")
    assert(dropped.mkdirs())
    assert(new java.io.File(s"$path/part=B")
      .renameTo(new java.io.File(dropped, "part=B")))

    // ANY next pass over the table heals: the parked partition must be
    // purged (the delete finishes), never restored (rows resurrected).
    Delete.deleteKeysPartitioned(spark, path,
      Seq(999L).toDF("k"), Seq("k"), "part")
    assert(!dropped.exists())
    assert(!new java.io.File(s"$path/part=B").exists())
    assert(spark.read.parquet(path).select("k").as[Long]
      .collect().toSeq == Seq(1L))
  }

  test("whole-table delete and missing-table no-op") {
    val root = Files.createTempDirectory("graft_delete2").toFile
    val path = s"$root/table"
    // deleting from a table that does not exist is a no-op, not a crash
    Delete.deleteKeys(spark, path, Seq(1L).toDF("k"), Seq("k"))
    assert(!new java.io.File(path).exists())

    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
      .write.parquet(path)
    Delete.deleteKeys(spark, path, Seq(2L).toDF("k"), Seq("k"))
    assert(spark.read.parquet(path).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
  }
}
