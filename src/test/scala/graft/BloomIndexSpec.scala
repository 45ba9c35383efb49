package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Per-file Bloom sidecar contract: on a bloom-indexed column, an
  * equality / IN predicate prunes files whose sidecar proves the key
  * absent — the point-lookup complement of min/max range stats, which
  * are useless when a high-cardinality key is scattered across every
  * file's full range (the unclustered CDC-merge shape). Bloom negatives
  * are exact (no false negatives → skipping is sound); false positives
  * only keep extra files (fail-open). Results must always equal
  * read().filter(pred). */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_bloom").toFile.toString + "/t"

  /** Ten single-file commits of interleaved ids (i, i+10, i+20, …) —
    * every file's [min,max] range spans nearly the whole key space, so
    * RANGE stats can never prune an equality probe, but each key lives
    * in exactly ONE file. */
  private def interleavedTable(): String = {
    val root = freshRoot()
    Snapshots.append(Seq(0L).toDF("id"), root) // v1 establishes the table
    Snapshots.setBloomColumns(spark, root, Seq("id"),
      expectedItems = 1000, fpp = 0.01)
    (0 until 10).foreach { i =>
      Snapshots.append(
        (0 until 30).map(j => i.toLong + 10L * j)
          .toDF("id").withColumn("src", lit(s"f$i")).repartition(1), root)
    }
    root
  }

  test("equality probe opens only bloom-surviving files; result exact") {
    val root = interleavedTable()
    // key 137 = 7 + 10*13 lives only in commit i=7's file; ranges
    // cannot prune (every file spans [i, i+290])
    val (keptRange, _) = Snapshots.pruneFiles(spark, root, $"id" === 137L)
    assert(keptRange.size <= 2, // the i=7 file (+ maybe v1's tiny file)
      s"bloom should cut 10 interleaved files to ~1, got ${keptRange.size}")
    val got = Snapshots.readWhere(spark, root, $"id" === 137L)
    assert(got.select("src").as[String].collect().toSeq == Seq("f7"))
    // IN-set probes prune to the union of the members' files
    val (keptIn, _) =
      Snapshots.pruneFiles(spark, root, $"id".isin(137L, 44L))
    assert(keptIn.size <= 3)
    assert(Snapshots.readWhere(spark, root, $"id".isin(137L, 44L))
      .count() == 2)
    // an absent key prunes everything — metadata-only miss
    val (keptMiss, _) =
      Snapshots.pruneFiles(spark, root, $"id" === 100000L)
    assert(keptMiss.isEmpty)
    assert(Snapshots.readWhere(spark, root, $"id" === 100000L).count() == 0)
  }

  test("string bloom columns probe by value; ranges stay fail-open") {
    val root = freshRoot()
    Snapshots.append(Seq(("seed", 0L)).toDF("tag", "n"), root)
    Snapshots.setBloomColumns(spark, root, Seq("tag"),
      expectedItems = 1000, fpp = 0.01)
    (0 until 5).foreach { i =>
      Snapshots.append(
        (0 until 20).map(j => (s"k${i}_$j", j.toLong))
          .toDF("tag", "n").repartition(1), root)
    }
    val (kept, _) = Snapshots.pruneFiles(spark, root, $"tag" === "k3_7")
    assert(kept.size <= 2)
    assert(Snapshots.readWhere(spark, root, $"tag" === "k3_7")
      .select("n").as[Long].collect().toSeq == Seq(7L))
  }

  test("merge on a bloom-indexed key rewrites only the key's files") {
    val root = interleavedTable()
    val before = Snapshots.read(spark, root).count()
    val mr = Snapshots.merge(spark, root,
      Seq((137L, "patched")).toDF("id", "src"), Seq("id"))
    assert(mr.rewrittenFiles <= 2 && mr.untouchedFiles >= 9,
      s"bloom footprint should touch ~1 file, rewrote ${mr.rewrittenFiles}")
    val after = Snapshots.read(spark, root)
    assert(after.count() == before)
    assert(after.filter($"id" === 137L).select("src").as[String]
      .collect().toSeq == Seq("patched"))
  }

  test("bloom survives append/compact/restore; unconfigured columns don't probe") {
    val root = interleavedTable()
    // a column without a bloom: equality on src falls back to ranges
    assert(Snapshots.readWhere(spark, root, $"src" === "f3").count() == 30)
    // compact rewrites all files — new sidecars are built for them
    Snapshots.compact(spark, root, numFiles = 4)
    assert(Snapshots.readWhere(spark, root, $"id" === 137L).count() == 1)
    val (keptC, _) = Snapshots.pruneFiles(spark, root, $"id" === 137L)
    assert(keptC.size <= 2, "post-compact sidecars must keep probing")
    // restore to a pre-compact version keeps its bloom lines
    val preCompact = Snapshots.versions(spark, root)
      .dropRight(1).last
    Snapshots.restore(spark, root, preCompact)
    val (keptR, _) = Snapshots.pruneFiles(spark, root, $"id" === 137L)
    assert(keptR.size <= 2)
  }

  test("soundness property: bloom-pruned results equal unpruned filter") {
    val root = interleavedTable()
    val full = Snapshots.read(spark, root)
    (0L until 300L by 7L).foreach { k =>
      val pruned = Snapshots.readWhere(spark, root, $"id" === k)
        .select("id", "src").as[(Long, String)].collect().toSet
      val plain = full.filter($"id" === k)
        .select("id", "src").as[(Long, String)].collect().toSet
      assert(pruned == plain, s"key $k")
    }
  }

  test("setBloomColumns validates existence and type") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 2.5)).toDF("k", "w"), root)
    intercept[IllegalArgumentException] {
      Snapshots.setBloomColumns(spark, root, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.setBloomColumns(spark, root, Seq("w")) // double: no bloom
    }
  }

  test("bloom config names physical columns: probing survives a rename") {
    val root = interleavedTable()
    Snapshots.renameColumn(spark, root, "id", "ident")
    Snapshots.append(
      (0 until 30).map(j => (300L + j, "fNew")).toDF("ident", "src")
        .repartition(1), root)
    val (kept, _) = Snapshots.pruneFiles(spark, root, $"ident" === 137L)
    assert(kept.size <= 2)
    assert(Snapshots.readWhere(spark, root, $"ident" === 305L)
      .select("src").as[String].collect().toSeq == Seq("fNew"))
  }
}
