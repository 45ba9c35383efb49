package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Column-mapping contract: RENAME is a metadata-only commit (logical
  * name changes, the physical file column never does — zero data moves
  * on a 100 TB table and every file era reads uniformly), DROP removes
  * the field from the pinned schema while older versions keep reading
  * it, and tombstones make name resurrection impossible — re-using a
  * dropped (or renamed-away) name would silently feed stale bytes into
  * a new column, so it is refused. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_colmap").toFile.toString + "/t"

  test("rename is metadata-only; old and new era files read uniformly") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    Snapshots.append(Seq((3L, "c")).toDF("k", "v"), root)
    val filesBefore = Snapshots.read(spark, root).inputFiles.toSet
    Snapshots.renameColumn(spark, root, "v", "label")
    // no data moved
    assert(Snapshots.read(spark, root).inputFiles.toSet == filesBefore)
    assert(Snapshots.read(spark, root).columns.toSeq == Seq("k", "label"))
    // an append AFTER the rename arrives in the new logical shape and
    // must unify with the pre-rename files
    Snapshots.append(Seq((4L, "d")).toDF("k", "label"), root)
    val got = Snapshots.read(spark, root).as[(Long, String)]
      .collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // time travel: the pre-rename version keeps its own names
    assert(Snapshots.read(spark, root, 2).columns.toSeq == Seq("k", "v"))
  }

  test("stats pruning still skips files after a rename") {
    val root = freshRoot()
    Seq(0L until 100L, 100L until 200L, 200L until 300L).foreach { r =>
      Snapshots.append(r.toDF("id").repartition(1), root)
    }
    Snapshots.renameColumn(spark, root, "id", "ident")
    val (kept, skipped) =
      Snapshots.pruneFiles(spark, root, $"ident" < 50L)
    assert(kept.size == 1 && skipped.size == 2,
      "stats are keyed by physical name and must survive the rename")
    assert(Snapshots.readWhere(spark, root, $"ident" < 50L).count() == 50)
    // post-rename appends' stats prune too
    Snapshots.append((300L until 400L).toDF("ident").repartition(1), root)
    val (k2, s2) = Snapshots.pruneFiles(spark, root, $"ident" >= 300L)
    assert(k2.size == 1 && s2.size == 3)
  }

  test("merge and delete keep working on a renamed key column") {
    val root = freshRoot()
    Snapshots.append(
      (0L until 100L).map(i => (i, i)).toDF("id", "score").repartition(2),
      root)
    Snapshots.renameColumn(spark, root, "id", "doc_id")
    Snapshots.merge(spark, root,
      Seq((7L, 700L)).toDF("doc_id", "score"), Seq("doc_id"))
    Snapshots.deleteWhere(spark, root, $"doc_id" >= 90L)
    val got = Snapshots.read(spark, root).as[(Long, Long)].collect().toMap
    assert(got.size == 90 && got(7L) == 700L && !got.contains(95L))
  }

  test("drop removes the column going forward; history keeps it") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "v", "w"), root)
    val v1 = Snapshots.currentVersion(spark, root).get
    Snapshots.dropColumn(spark, root, "w")
    assert(Snapshots.read(spark, root).columns.toSeq == Seq("k", "v"))
    assert(Snapshots.read(spark, root, v1).columns.toSeq ==
      Seq("k", "v", "w"))
    // re-introducing the dropped name would resurrect stale bytes
    val e = intercept[IllegalArgumentException] {
      Snapshots.append(Seq((3L, "c", 9.9)).toDF("k", "v", "w"), root)
    }
    assert(e.getMessage.contains("previously dropped"))
    // restore to the pre-drop version brings the column back
    Snapshots.restore(spark, root, v1)
    assert(Snapshots.read(spark, root).columns.toSeq ==
      Seq("k", "v", "w"))
  }

  test("a new column may not take a renamed column's physical name") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.renameColumn(spark, root, "v", "label")
    // "v" is still the PHYSICAL name behind "label": a new logical "v"
    // would cross-feed label's bytes in old files
    val e = intercept[IllegalArgumentException] {
      Snapshots.append(Seq((2L, "b", "x")).toDF("k", "label", "v"), root)
    }
    assert(e.getMessage.contains("physical name"))
  }

  test("compact and optimize preserve the mapping and tombstones") {
    val root = freshRoot()
    Seq(0L until 100L, 100L until 200L).foreach { r =>
      Snapshots.append(
        r.toDF("id").withColumn("w", lit(1.0)).repartition(1), root)
    }
    Snapshots.renameColumn(spark, root, "id", "ident")
    Snapshots.dropColumn(spark, root, "w")
    Snapshots.compact(spark, root, numFiles = 1)
    assert(Snapshots.read(spark, root).columns.toSeq == Seq("ident"))
    assert(Snapshots.read(spark, root).count() == 200)
    // pruning across the compacted (rewritten) file still works
    assert(Snapshots.readWhere(spark, root, $"ident" < 10L).count() == 10)
    // tombstone survived the rewrite: the dropped name stays refused
    intercept[IllegalArgumentException] {
      Snapshots.append(Seq((1L, 2.0)).toDF("ident", "w"), root)
    }
    // and a post-compact append still unifies
    Snapshots.append((200L until 210L).toDF("ident"), root)
    assert(Snapshots.read(spark, root).count() == 210)
  }

  test("changesSince delivers post-rename appends in the new shape") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.renameColumn(spark, root, "v", "label")
    Snapshots.append(Seq((2L, "b")).toDF("k", "label"), root)
    val delta = Snapshots.changesSince(spark, root, 1)
    assert(delta.columns.toSeq == Seq("k", "label"))
    assert(delta.as[(Long, String)].collect().toSeq == Seq((2L, "b")))
  }

  test("overwrite restarts the lineage: tombstones clear") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 1.0)).toDF("k", "w"), root)
    Snapshots.dropColumn(spark, root, "w")
    intercept[IllegalArgumentException] {
      Snapshots.append(Seq((2L, 2.0)).toDF("k", "w"), root)
    }
    // overwrite replaces every file of the new current version — no
    // stale bytes can resurrect, so the name is free again
    Snapshots.overwrite(Seq((9L, 9.0)).toDF("k", "w"), root)
    Snapshots.append(Seq((10L, 10.0)).toDF("k", "w"), root)
    assert(Snapshots.read(spark, root).as[(Long, Double)]
      .collect().toSet == Set((9L, 9.0), (10L, 10.0)))
  }
}
