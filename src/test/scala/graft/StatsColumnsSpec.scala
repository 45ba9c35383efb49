package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
  StructField, StructType}

import graft.ops.Snapshots

/** Declared stats columns: on a WIDE table (more than
  * [[Snapshots.StatsMaxCols]] = 32 stat-eligible columns) the
  * positional cap must not silently strip min/max stats from the keys
  * the table declared it reads by — declared `cluster.columns` (and
  * bloom columns) are force-included past the cap, and a
  * `stats.columns` property replaces the positional selection
  * outright (Delta's `dataSkippingStatsColumns` shape). Declaring a
  * missing or stat-ineligible column refuses loudly. */
class StatsColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_statcols").toFile.toString + "/t"

  /** 40 stat-eligible long columns c00..c39, every one equal to id,
    * scattered across 4 partitions so write clustering has work. */
  private def wide() =
    spark.range(400).repartition(4, pmod($"id", lit(17)))
      .select((0 until 40).map(i => $"id".as(f"c$i%02d")): _*)

  private val wideSchema = StructType(
    (0 until 40).map(i => StructField(f"c$i%02d", LongType)))

  test("declared cluster key past position 32 carries stats and prunes") {
    val root = freshRoot()
    // c38 is the 39th eligible column — beyond the positional cap
    Snapshots.createTable(spark, root, wideSchema,
      properties = Map("cluster.columns" -> "c38"))
    Snapshots.append(wide(), root)
    // cluster-on-write shaped the append by c38; with force-included
    // stats a point predicate keeps exactly one data file
    val (kept, skipped) = Snapshots.pruneFiles(spark, root, $"c38" === 123)
    assert(kept.size == 1 && skipped.size >= 3, s"$kept / $skipped")
    // stats-decided aggregates on the tail key work end-to-end
    val r = Snapshots.countWhere(spark, root, $"c38" >= 100 && $"c38" < 300)
    assert(r.count == 200 && r.allMatchFiles + r.prunedFiles >= 3, r)
    // the first 32 positional columns still carry stats alongside
    val (k0, s0) = Snapshots.pruneFiles(spark, root, $"c00" === 123)
    assert(k0.size == 1 && s0.size >= 3, s"$k0 / $s0")
  }

  test("stats.columns REPLACES the positional selection") {
    val root = freshRoot()
    // first commit: positional stats (c00..c31)
    Snapshots.append(wide().coalesce(1), root)
    Snapshots.setProperty(spark, root, "stats.columns", "c39")
    // second commit: stats for exactly c39
    Snapshots.append(wide().coalesce(1)
      .select((0 until 40).map(i => (col(f"c$i%02d") + 1000)
        .as(f"c$i%02d")): _*), root)
    // impossible c39 value: the post-property file disproves via its
    // c39 stats; the pre-property file has no c39 stats and must be
    // KEPT (fail-open)
    val (k39, s39) = Snapshots.pruneFiles(spark, root, $"c39" === -5L)
    assert(k39.size == 1 && s39.size == 1, s"$k39 / $s39")
    // impossible c00 value: the PRE-property file disproves (it has
    // positional c00 stats); the post-property file no longer carries
    // c00 stats and must be kept
    val (k0, s0) = Snapshots.pruneFiles(spark, root, $"c00" === -5L)
    assert(k0.size == 1 && s0.size == 1, s"$k0 / $s0")
    // correctness is unaffected either way
    assert(Snapshots.read(spark, root).filter($"c39" >= 1000).count() == 400)
  }

  test("stats.columns force-includes declared cluster keys too") {
    val root = freshRoot()
    Snapshots.createTable(spark, root, wideSchema, properties = Map(
      "cluster.columns" -> "c38", "stats.columns" -> "c05"))
    Snapshots.append(wide(), root)
    // c38 carries stats although stats.columns names only c05
    val (kept, skipped) = Snapshots.pruneFiles(spark, root, $"c38" === 123)
    assert(kept.size == 1 && skipped.size >= 3, s"$kept / $skipped")
    val (k5, s5) = Snapshots.pruneFiles(spark, root, $"c05" === 123)
    assert(k5.size == 1 && s5.size >= 3, s"$k5 / $s5")
    // a column in neither declaration carries no stats: nothing prunes
    val (k7, s7) = Snapshots.pruneFiles(spark, root, $"c07" === -5L)
    assert(s7.isEmpty, s"$k7 / $s7")
  }

  test("declarations follow RENAME COLUMN; DROP of a declared key refuses") {
    val root = freshRoot()
    Snapshots.createTable(spark, root, StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("c", LongType))), properties = Map(
      "cluster.columns" -> "b", "stats.columns" -> "c"))
    // rename rewrites the declarations — they never go silently stale
    Snapshots.renameColumn(spark, root, "b", "bb")
    val ps = Snapshots.tableProperties(spark, root)
    assert(ps.get("cluster.columns").contains("bb"), ps.toString)
    assert(ps.get("stats.columns").contains("c"), ps.toString)
    // dropping a declared key refuses until the property stops naming it
    val e = intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, root, "c")
    }
    assert(e.getMessage.contains("stats.columns"), e.getMessage)
    Snapshots.setProperty(spark, root, "stats.columns", "a")
    Snapshots.dropColumn(spark, root, "c") // now fine
    assert(!Snapshots.read(spark, root).columns.contains("c"))
  }

  test("declaring a missing or stat-ineligible column refuses") {
    val root = freshRoot()
    Snapshots.createTable(spark, root, StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("emb", ArrayType(DoubleType)))))
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.setProperty(spark, root, "stats.columns", "id,nope")
    }
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.setProperty(spark, root, "cluster.columns", "emb")
    }
    assert(e2.getMessage.contains("stat-eligible"), e2.getMessage)
    // the same guard at CREATE time
    val e3 = intercept[IllegalArgumentException] {
      Snapshots.createTable(spark, freshRoot(), wideSchema,
        properties = Map("stats.columns" -> "c99"))
    }
    assert(e3.getMessage.contains("c99"), e3.getMessage)
  }
}
