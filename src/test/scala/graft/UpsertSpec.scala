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

  test("first write dedups in-batch duplicate keys (newest wins)") {
    val dir = Files.createTempDirectory("upsert4").toFile
    val path = s"$dir/t"
    Upsert.upsertParquet(
      Seq(("a", "old", 1L), ("a", "new", 2L)).toDF(cols: _*),
      path, Seq("k"), "ver")
    val out = spark.read.parquet(path).as[(String, String, Long)]
      .collect().toSeq
    assert(out == Seq(("a", "new", 2L)))
  }

  test("partitioned upsert preserves existing rows in the null partition") {
    val pcols = Seq("k", "v", "ver", "day")
    val dir = Files.createTempDirectory("upsert5").toFile
    val path = s"$dir/t"
    Upsert.upsertParquetPartitioned(
      Seq(("a", "v1", 1L, null: String)).toDF(pcols: _*),
      path, Seq("k"), "ver", "day")
    // second batch also hits the null partition with a DIFFERENT key —
    // the existing null-partition row must survive the dynamic overwrite
    Upsert.upsertParquetPartitioned(
      Seq(("b", "w1", 1L, null: String)).toDF(pcols: _*),
      path, Seq("k"), "ver", "day")
    val out = spark.read.parquet(path).orderBy("k")
      .select("k", "v", "ver").as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "v1", 1L), ("b", "w1", 1L)))
  }

  test("partitioned upsert only rewrites touched partitions") {
    val pcols = Seq("k", "v", "ver", "day")
    val dir = Files.createTempDirectory("upsert3").toFile
    val path = s"$dir/t"
    Upsert.upsertParquetPartitioned(
      Seq(("a", "v1", 1L, "d1"), ("b", "w1", 1L, "d2")).toDF(pcols: _*),
      path, Seq("k"), "ver", "day")
    val d2FileBefore = new java.io.File(s"$path/day=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq

    // second batch touches ONLY d1: update 'a', insert 'c'
    Upsert.upsertParquetPartitioned(
      Seq(("a", "v2", 2L, "d1"), ("c", "x1", 1L, "d1")).toDF(pcols: _*),
      path, Seq("k"), "ver", "day")

    val out = spark.read.parquet(path).orderBy("k")
      .as[(String, String, Long, String)].collect().toSeq
    assert(out == Seq(("a", "v2", 2L, "d1"), ("b", "w1", 1L, "d2"),
      ("c", "x1", 1L, "d1")))
    // untouched d2 partition files survive byte-identically (same names)
    val d2FileAfter = new java.io.File(s"$path/day=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
    assert(d2FileAfter == d2FileBefore, "d2 partition must not be rewritten")
  }

  test("merge properties: idempotent, associative-by-batch, seeded sweep") {
    // seeded generator, evaluated against a reference fold — the
    // StatsPropertySpec pattern (scalacheck bridge is offline)
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { _ =>
      val universe = Seq("a", "b", "c", "d")
      def batch(sz: Int) = Seq.fill(sz)(
        (universe(rnd.nextInt(universe.size)),
          rnd.nextInt(100).toString, rnd.nextInt(5).toLong))
      val b1 = batch(6).toDF(cols: _*)
      val b2 = batch(6).toDF(cols: _*)
      val empty = b1.limit(0)
      // idempotence: applying a merged state to itself changes nothing
      val m1 = Upsert.merge(empty, b1, Seq("k"), "ver")
      val m1Again = Upsert.merge(m1, m1, Seq("k"), "ver")
      assert(m1Again.orderBy("k", "v").collect().toSeq ==
        m1.orderBy("k", "v").collect().toSeq)
      // one row per key always
      val m12 = Upsert.merge(m1, b2, Seq("k"), "ver")
      val keys = m12.select("k").collect().map(_.getString(0)).toSeq
      assert(keys.distinct.size == keys.size)
      // batch-at-once ≡ batch-then-batch for disjoint-version updates:
      // every key's winner is the max (ver, isNew-tag, payload) — check
      // winners against a driver-side fold of the same comparison
      val all =
        m1.as[(String, String, Long)].collect().toSeq.map(r => (r, 0)) ++
          b2.as[(String, String, Long)].collect().toSeq.map(r => (r, 1))
      val expect = all.groupBy(_._1._1).map { case (k, rows) =>
        // mirror merge's struct max: (version, updates-beat-existing tag,
        // then the remaining payload column)
        val winner = rows.maxBy { case ((_, v, ver), tag) => (ver, tag, v) }
        k -> (winner._1._2, winner._1._3)
      }
      val got = m12.as[(String, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expect)
    }
  }

  // ---- crash recovery around the stage-and-swap --------------------------

  test("interrupted whole-table swap is healed: parked copy restored, not lost") {
    val dir = Files.createTempDirectory("upsert6").toFile
    val path = s"$dir/t"
    Upsert.upsertParquet(Seq(("a", "v1", 1L)).toDF(cols: _*),
      path, Seq("k"), "ver")
    // simulate a crash between the two swap renames: the table has been
    // renamed aside, its replacement never landed
    assert(new java.io.File(path).renameTo(new java.io.File(s"${path}__old__")))
    assert(!new java.io.File(path).exists)
    // next upsert must first restore the parked copy, then merge into it
    Upsert.upsertParquet(Seq(("b", "w1", 1L)).toDF(cols: _*),
      path, Seq("k"), "ver")
    val out = spark.read.parquet(path).orderBy("k")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "v1", 1L), ("b", "w1", 1L)))
    assert(!new java.io.File(s"${path}__old__").exists)
  }

  test("interrupted partition swap is healed; backups never pollute the table") {
    val pcols = Seq("k", "v", "ver", "day")
    val dir = Files.createTempDirectory("upsert7").toFile
    val path = s"$dir/t"
    Upsert.upsertParquetPartitioned(
      Seq(("a", "v1", 1L, "d1"), ("b", "w1", 1L, "d2")).toDF(pcols: _*),
      path, Seq("k"), "ver", "day")
    // backups park OUTSIDE the table dir — a reader mid-swap must never
    // see a phantom partition value like day=d1__old__
    assert(!new java.io.File(path).listFiles().exists(_.getName.contains("__old__")))
    // simulate a crash mid-partition-swap: day=d1 parked, replacement lost
    new java.io.File(s"${path}__old__").mkdirs()
    assert(new java.io.File(s"$path/day=d1")
      .renameTo(new java.io.File(s"${path}__old__/day=d1")))
    // next upsert (touching only d2) must restore d1 from the parking dir
    Upsert.upsertParquetPartitioned(
      Seq(("b", "w2", 2L, "d2")).toDF(pcols: _*),
      path, Seq("k"), "ver", "day")
    val out = spark.read.parquet(path).orderBy("k")
      .as[(String, String, Long, String)].collect().toSeq
    assert(out == Seq(("a", "v1", 1L, "d1"), ("b", "w2", 2L, "d2")))
    assert(!new java.io.File(s"${path}__old__").exists)
  }
}
