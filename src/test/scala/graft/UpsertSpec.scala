package graft

import java.nio.file.Files

import graft.ops.Upsert

/** Upsert invariants behind the reference's ON CONFLICT DO UPDATE
  * (funding_rates_etl.py:103-108): newest wins, updates beat ties,
  * applying the same batch twice ≡ once. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("k", "v", "ver")

  test("newest version wins; update beats existing on tie") {
    val existing = Seq(("a", "old", 1L), ("b", "keep", 5L)).toDF(cols: _*)
    val updates = Seq(("a", "new", 2L), ("b", "tie", 5L), ("c", "ins", 1L))
      .toDF(cols: _*)
    val out = Upsert.merge(existing, updates, Seq("k"), "ver")
      .orderBy("k").as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "new", 2L), ("b", "tie", 5L), ("c", "ins", 1L)))
  }

  test("upsertParquet is idempotent (same batch twice ≡ once)") {
    val dir = Files.createTempDirectory("upsert").toFile
    val path = s"$dir/t"
    val batch = Seq(("a", "x", 1L), ("b", "y", 2L)).toDF(cols: _*)
    Upsert.upsertParquet(batch, path, Seq("k"), "ver")
    val once = spark.read.parquet(path).orderBy("k").collect().toSeq
    Upsert.upsertParquet(batch, path, Seq("k"), "ver")
    val twice = spark.read.parquet(path).orderBy("k").collect().toSeq
    assert(once == twice)
  }

  test("upsertParquet merges across calls") {
    val dir = Files.createTempDirectory("upsert2").toFile
    val path = s"$dir/t"
    Upsert.upsertParquet(Seq(("a", "v1", 1L)).toDF(cols: _*), path, Seq("k"), "ver")
    Upsert.upsertParquet(Seq(("a", "v2", 2L), ("b", "w", 1L)).toDF(cols: _*),
      path, Seq("k"), "ver")
    val out = spark.read.parquet(path).orderBy("k")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "v2", 2L), ("b", "w", 1L)))
  }
}
