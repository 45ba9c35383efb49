package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Bucketed snapshot layout: optimizeBucketed commits a content-identical
  * version whose files carry Spark's native bucket layout; bucketedTable
  * re-exposes it as a catalog bucketed table, so two snapshot tables
  * bucketed alike join with ZERO shuffle exchanges; content commits after
  * the layout invalidate it loudly. */
class BucketedSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_bsnap").toFile.toString + "/t"

  private lazy val facts =
    (0L until 1000L).map(i => (i % 100, i)).toDF("k", "seq")
  private lazy val dims =
    (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")

  test("bucketed commit is content-identical and versioned") {
    val root = freshRoot()
    Snapshots.append(facts, root)
    val before = Snapshots.read(spark, root)
      .collect().map(_.toString).sorted.toSeq
    val v = Snapshots.optimizeBucketed(spark, root, Seq("k"), buckets = 8)
    assert(v == 2)
    assert(Snapshots.read(spark, root)
      .collect().map(_.toString).sorted.toSeq == before)
    assert(Snapshots.bucketSpecOf(spark, root).get.buckets == 8)
    // history records the layout commit
    assert(Snapshots.history(spark, root).orderBy(col("version").desc)
      .head().getString(2) == "optimize-bucketed")
  }

  test("two bucketed snapshot tables join with zero shuffles") {
    val rootF = freshRoot(); val rootD = freshRoot()
    Snapshots.append(facts, rootF)
    Snapshots.append(dims, rootD)
    Snapshots.optimizeBucketed(spark, rootF, Seq("k"), 8, sortCols = Seq("k"))
    Snapshots.optimizeBucketed(spark, rootD, Seq("k"), 8, sortCols = Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Snapshots.bucketedTable(spark, rootF, "bsnap_f")
        .join(Snapshots.bucketedTable(spark, rootD, "bsnap_d"), Seq("k"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed snapshot join must not shuffle, found: $shuffles")
      val expected = facts.join(dims, Seq("k"))
        .collect().map(_.toString).sorted.toSeq
      assert(joined.collect().map(_.toString).sorted.toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("a content commit after the layout invalidates it loudly") {
    val root = freshRoot()
    Snapshots.append(facts, root)
    val bv = Snapshots.optimizeBucketed(spark, root, Seq("k"), 4)
    Snapshots.append(Seq((999L, 999L)).toDF("k", "seq"), root)
    val e = intercept[IllegalStateException] {
      Snapshots.bucketedTable(spark, root, "bsnap_stale")
    }
    assert(e.getMessage.contains("optimizeBucketed"))
    // …but the bucketed VERSION stays pinnable (time travel keeps layout)
    assert(Snapshots.bucketedTable(spark, root, "bsnap_pin", version = bv)
      .count() == 1000)
  }

  test("stats skipping works on the bucketed commit's files") {
    val root = freshRoot()
    Snapshots.append(facts, root)
    Snapshots.optimizeBucketed(spark, root, Seq("k"), 8)
    // the bucketed rewrite regenerated stats: a range read must both
    // prune (file-level) and return exactly the filtered content
    val got = Snapshots.readWhere(spark, root, col("seq") < 10L)
      .collect().map(_.toString).sorted.toSeq
    assert(got == facts.filter(col("seq") < 10L)
      .collect().map(_.toString).sorted.toSeq)
    // metadata-only aggregate still proves (bucketed files carry stats)
    assert(Snapshots.aggregateFromManifest(spark, root, Seq("seq"))
      .get.head().getLong(0) == 1000L)
  }

  test("constraints and vacuum interact correctly with the layout commit") {
    val root = freshRoot()
    Snapshots.append(facts, root)
    Snapshots.setConstraint(spark, root, "k_nonneg", "k >= 0")
    Snapshots.optimizeBucketed(spark, root, Seq("k"), 4)
    assert(Snapshots.constraints(spark, root).size == 1) // carried
    // vacuum to just the bucketed version: old files reaped, reads fine
    Snapshots.vacuum(spark, root, keepVersions = 1)
    assert(Snapshots.read(spark, root).count() == 1000)
    assert(Snapshots.bucketedTable(spark, root, "bsnap_vac").count() == 1000)
  }

  test("column-mapped tables refuse the bucketed rewrite") {
    val root = freshRoot()
    Snapshots.append(facts, root)
    Snapshots.renameColumn(spark, root, "seq", "sequence")
    intercept[IllegalArgumentException] {
      Snapshots.optimizeBucketed(spark, root, Seq("k"), 4)
    }
  }
}
