package graft

import java.nio.file.Files

import graft.ops.Compact

/** Compaction contract: needy partitions' file counts drop with data
  * bit-identical, partitions under the threshold are never touched, and
  * the report says exactly what happened. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    dir.listFiles().toSeq.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))

  private def fileSigs(dir: java.io.File): Set[(String, Long, Long)] =
    dataFiles(dir).map(f => (f.getPath, f.length, f.lastModified)).toSet

  test("needy partitions coalesce; healthy partitions untouched") {
    val root = Files.createTempDirectory("graft_compact").toFile
    val path = s"$root/table"
    // partition A: 8 fragments; partition B: 1 file
    (1L to 800L).map(i => (i, "A")).toDF("k", "part")
      .repartition(8).write.partitionBy("part").parquet(path)
    (1001L to 1100L).map(i => (i, "B")).toDF("k", "part")
      .repartition(1).write.mode("append").partitionBy("part").parquet(path)
    assert(dataFiles(new java.io.File(s"$path/part=A")).size == 8)
    val bBefore = fileSigs(new java.io.File(s"$path/part=B"))
    val before = spark.read.parquet(path)
      .as[(Long, String)].collect().sorted.toSeq

    val reports = Compact.compactPartitions(spark, path, "part",
      maxFiles = 2, targetBytes = 1L << 30)

    // A coalesced to 1 file (bytes << targetBytes), B untouched
    assert(dataFiles(new java.io.File(s"$path/part=A")).size == 1)
    assert(fileSigs(new java.io.File(s"$path/part=B")) == bBefore)
    val byDir = reports.map(r => r.dir -> r).toMap
    assert(byDir("part=A").compacted && byDir("part=A").files == 8)
    assert(!byDir("part=B").compacted && byDir("part=B").files == 1)
    // data bit-identical
    val after = spark.read.parquet(path)
      .as[(Long, String)].collect().sorted.toSeq
    assert(after == before)
    // no staging/parking leftovers that a reader could trip on
    assert(!new java.io.File(s"${path}__staging__").exists())
    assert(!new java.io.File(s"${path}__old__").exists())

    // second run: everything healthy, nothing compacted
    val again = Compact.compactPartitions(spark, path, "part",
      maxFiles = 2, targetBytes = 1L << 30)
    assert(again.forall(!_.compacted))
  }
}
