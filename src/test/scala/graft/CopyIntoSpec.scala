package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Snapshots

/** COPY INTO — idempotent file-level ingestion. The contract under
  * test: file identity is the fully-qualified path; the loaded-file
  * ledger commits ATOMICALLY with the data (re-runs are no-ops, never
  * duplicates); the ledger survives vacuum via `_ingest/` sidecar
  * markers; `force` re-loads; `pattern` globs; non-self-describing
  * formats read with the table's pinned schema. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.toString

  /** Write `rows` as exactly one parquet file under `dir/sub`. */
  private def land(dir: String, sub: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "s").coalesce(1).write.parquet(s"$dir/$sub")

  test("first load ingests every listed file; rerun is a no-op") {
    val src = tmp("graft_ci_src"); val t = tmp("graft_ci_t") + "/t"
    land(src, "w1", Seq((1L, "a"), (2L, "b")))
    land(src, "w2", Seq((3L, "c")))
    val r1 = Snapshots.copyInto(spark, t, src)
    assert(r1.filesLoaded == 2 && r1.rowsLoaded == 3L &&
      r1.filesSkipped == 0)
    assert(Snapshots.read(spark, t).count() == 3)
    val r2 = Snapshots.copyInto(spark, t, src)
    assert(r2.filesLoaded == 0 && r2.rowsLoaded == 0L &&
      r2.filesSkipped == 2, "second run must skip everything")
    assert(r2.version == r1.version, "a no-op run must not commit")
    assert(Snapshots.read(spark, t).count() == 3, "no duplicates")
  }

  test("only files that appeared since the last run load") {
    val src = tmp("graft_ci_src"); val t = tmp("graft_ci_t") + "/t"
    land(src, "w1", Seq((1L, "a"), (2L, "b")))
    Snapshots.copyInto(spark, t, src)
    land(src, "w2", Seq((3L, "c"), (4L, "d")))
    land(src, "w3", Seq((5L, "e")))
    val r = Snapshots.copyInto(spark, t, src)
    assert(r.filesLoaded == 2 && r.rowsLoaded == 3L && r.filesSkipped == 1)
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("force re-loads already-ingested files") {
    val src = tmp("graft_ci_src"); val t = tmp("graft_ci_t") + "/t"
    land(src, "w1", Seq((1L, "a")))
    Snapshots.copyInto(spark, t, src)
    val r = Snapshots.copyInto(spark, t, src, force = true)
    assert(r.filesLoaded == 1)
    assert(Snapshots.read(spark, t).count() == 2,
      "force loads regardless of the ledger")
  }

  test("the ledger survives a deep vacuum (sidecar markers)") {
    val src = tmp("graft_ci_src"); val t = tmp("graft_ci_t") + "/t"
    land(src, "w1", Seq((1L, "a"), (2L, "b")))
    Snapshots.copyInto(spark, t, src)
    // bury the copy-into commit under enough appends that vacuum
    // drops its manifest even through the delta-chain closure
    (1 to 12).foreach(i =>
      Snapshots.append(Seq((100L + i, "x")).toDF("id", "s"), t))
    Snapshots.compact(spark, t, 1) // checkpoint: cuts the chain closure
    val (dropped, _) = Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(dropped > 0, "vacuum must actually drop the ledger manifests")
    assert(Snapshots.ingestedFiles(spark, t).size == 1,
      "the ledger must survive via the _ingest/ sidecar")
    val r = Snapshots.copyInto(spark, t, src)
    assert(r.filesLoaded == 0 && r.filesSkipped == 1,
      "post-vacuum rerun must still be a no-op")
  }

  test("pattern globs; hidden and empty files are skipped") {
    val src = tmp("graft_ci_src"); val t = tmp("graft_ci_t") + "/t"
    land(src, "keep", Seq((1L, "a")))
    land(src, "_staging", Seq((9L, "z"))) // _-prefixed dir: hidden
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(src, "empty.parquet")) // zero bytes
    val rAll = Snapshots.copyInto(spark, t, src)
    assert(rAll.filesLoaded == 1 && rAll.rowsLoaded == 1L,
      "hidden dirs and empty files never load")
    // glob restricted to a subdir that has nothing new
    val rGlob = Snapshots.copyInto(spark, t, src,
      pattern = "keep/*.parquet")
    assert(rGlob.filesLoaded == 0 && rGlob.filesSkipped == 1)
  }

  test("csv without an explicit schema reads with the table's pinned " +
      "schema; constraints enforce on ingested rows") {
    val root = tmp("graft_ci_csvt")
    val t = root + "/t"
    Snapshots.createTable(spark, t,
      StructType(Seq(StructField("id", LongType),
        StructField("s", StringType))),
      checkConstraints = Map("pos_id" -> "id > 0"))
    val src = tmp("graft_ci_csv")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "a.csv"),
      "7,hello\n8,world\n".getBytes("UTF-8"))
    val r = Snapshots.copyInto(spark, t, src, format = "csv")
    assert(r.rowsLoaded == 2L)
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((7L, "hello"), (8L, "world")))
    // a violating wave refuses and commits nothing
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "b.csv"), "-1,bad\n".getBytes("UTF-8"))
    val e = intercept[Exception](
      Snapshots.copyInto(spark, t, src, format = "csv"))
    assert(e.getMessage.contains("pos_id"))
    assert(Snapshots.read(spark, t).count() == 2)
    // the refused file is NOT in the ledger: fixing it re-ingests
    assert(!Snapshots.ingestedFiles(spark, t).exists(_.endsWith("b.csv")))
  }

  test("csv into a non-existent table without a schema refuses loudly") {
    val src = tmp("graft_ci_csv2")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "a.csv"), "1,x\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      Snapshots.copyInto(spark, tmp("graft_ci_t2") + "/t", src,
        format = "csv"))
    assert(e.getMessage.contains("needs a schema"))
  }

  test("CALL copy_into: the SQL surface returns the run's accounting") {
    val w = tmp("graft_ci_wh")
    spark.conf.set("spark.sql.catalog.gci", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gci.warehouse", w)
    val src = tmp("graft_ci_src")
    land(src, "w1", Seq((1L, "a"), (2L, "b")))
    spark.sql("CREATE TABLE gci.default.ing (id BIGINT, s STRING) USING graft")
    val row = spark.sql(
      s"CALL gci.system.copy_into(table => 'default.ing', source => '$src')")
      .collect().head
    def n(r: org.apache.spark.sql.Row, c: String): Long =
      r.getAs[Number](c).longValue
    assert(n(row, "files_loaded") == 1 && n(row, "rows_loaded") == 2L)
    val again = spark.sql(
      s"CALL gci.system.copy_into(table => 'default.ing', source => '$src')")
      .collect().head
    assert(n(again, "files_loaded") == 0 &&
      n(again, "files_skipped") == 1)
    assert(spark.sql("SELECT count(*) c FROM gci.default.ing").collect()
      .head.getLong(0) == 2L)
    // detail reports the ledger size
    val det = spark.sql("CALL gci.system.detail(table => 'default.ing')")
      .collect().head
    assert(det.getAs[Number]("ingested_files").intValue == 1)
  }

  test("CALL copy_into with a DDL schema bootstraps a csv table") {
    val w = tmp("graft_ci_wh2")
    spark.conf.set("spark.sql.catalog.gcs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs.warehouse", w)
    val src = tmp("graft_ci_csv3")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "a.csv"), "1,x\n2,y\n".getBytes("UTF-8"))
    val row = spark.sql(
      s"CALL gcs.system.copy_into(table => 'default.boot', " +
        s"source => '$src', format => 'csv', " +
        "schema => 'id BIGINT, s STRING')").collect().head
    assert(row.getAs[Number]("rows_loaded").longValue == 2L)
    assert(spark.sql("SELECT id, s FROM gcs.default.boot ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "x"), (2L, "y")))
  }
}
