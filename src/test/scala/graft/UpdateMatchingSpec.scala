package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Key-frame UPDATE ([[Snapshots.updateMatching]]) — the UPDATE twin
  * of deleteMatching: rows named by the key frame get the assignments,
  * everything else carries byte-identical; the file footprint tracks
  * the key set, not the table. */
class UpdateMatchingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_um").toFile.toString + "/t"

  /** Four single-file commits with disjoint id ranges (0-9 ... 30-39). */
  private def rangeTable(): String = {
    val root = freshRoot()
    (0 until 4).foreach { b =>
      Snapshots.append(
        spark.range(b * 10L, b * 10L + 10)
          .select($"id", ($"id" * 2.0).as("v"), lit("x").as("tag"))
          .coalesce(1), root)
    }
    root
  }

  test("narrow key set rewrites only its keys' files") {
    val root = rangeTable()
    val keysDf = Seq(3L, 7L).toDF("id")
    val r = Snapshots.updateMatching(spark, root, keysDf, Seq("id"),
      Seq("v" -> lit(-1.0)))
    assert(r.rewrittenFiles == 1 && r.untouchedFiles == 3, r.toString)
    val got = Snapshots.read(spark, root).orderBy("id")
      .select("id", "v").as[(Long, Double)].collect()
    assert(got.filter(t => t._1 == 3 || t._1 == 7).forall(_._2 == -1.0))
    assert(got.filter(t => t._1 != 3 && t._1 != 7)
      .forall(t => t._2 == t._1 * 2.0))
    assert(Snapshots.history(spark, root).head().getString(2) == "update")
  }

  test("duplicate target keys each update; NULL frame keys drop; " +
      "assignments may reference row values") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 10.0), (1L, 20.0), (2L, 30.0))
      .toDF("k", "v"), root)
    Snapshots.updateMatching(spark, root,
      Seq(Some(1L), None).toDF("k"), Seq("k"),
      Seq("v" -> (col("v") + 0.5)))
    // both k=1 rows updated (semi semantics, unlike merge's
    // replace-by-key); the NULL key matched nothing
    assert(Snapshots.read(spark, root).orderBy("v")
      .as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.5), (1L, 20.5), (2L, 30.0)))
  }

  test("empty / all-NULL key frame commits nothing") {
    val root = rangeTable()
    val before = Snapshots.versions(spark, root)
    val r = Snapshots.updateMatching(spark, root,
      Seq.empty[Long].toDF("id"), Seq("id"), Seq("v" -> lit(0.0)))
    assert(r.rewrittenFiles == 0)
    assert(Snapshots.versions(spark, root) == before)
  }

  test("change feed pairs a key-frame update into pre/post images") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), root)
    Snapshots.updateMatching(spark, root, Seq(2L).toDF("k"), Seq("k"),
      Seq("v" -> lit(9.0)))
    val feed = Snapshots.changeFeed(spark, root, 1)
      .select("_change_type", "k", "v").as[(String, Long, Double)]
      .collect().toSet
    assert(feed == Set(
      ("update_preimage", 2L, 2.0), ("update_postimage", 2L, 9.0)))
  }

  test("assigned values cast to the column's declared type; CHECK " +
      "constraints enforce on the rewrite") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 5.0)).toDF("k", "v"), root)
    Snapshots.setConstraint(spark, root, "v_pos", "v > 0")
    Snapshots.updateMatching(spark, root, Seq(1L).toDF("k"), Seq("k"),
      Seq("v" -> lit(7))) // INT literal casts to DOUBLE
    assert(Snapshots.read(spark, root).as[(Long, Double)].head() ==
      ((1L, 7.0)))
    intercept[Exception] {
      Snapshots.updateMatching(spark, root, Seq(1L).toDF("k"), Seq("k"),
        Seq("v" -> lit(-1.0)))
    }
    assert(Snapshots.read(spark, root).as[(Long, Double)].head() ==
      ((1L, 7.0))) // the refused update committed nothing
  }
}
