package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** CONVERT: in-place import of an existing parquet directory — the
  * manifest lists the files where they stand (zero data movement),
  * footer stats are exact and prune, the converted table takes the
  * full DML/maintenance surface, and the documented refusals fire. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_cv").toFile.toString + "/t"

  private def fixture(dir: String): Unit =
    (1L to 200L).map(i => (i, i * 2.5, s"s$i",
      java.sql.Date.valueOf(s"2024-01-${1 + (i % 28).toInt}"),
      java.sql.Timestamp.valueOf(s"2024-02-01 00:00:${i % 60}")))
      .toDF("id", "v", "s", "d", "ts")
      .repartition(4, col("id")).write.parquet(dir)

  test("convert manifests the files in place; contents match a direct " +
      "read and the original bytes are untouched") {
    val t = tmp()
    fixture(t)
    val before = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val direct = spark.read.parquet(t).collect().map(_.toSeq).toSet
    val r = Snapshots.convert(spark, t)
    assert(r.version == 1 && r.files == before.size && r.rows == 200L)
    assert(Snapshots.read(spark, t).collect().map(_.toSeq).toSet == direct)
    // zero data movement: same files, same mtimes
    val after = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "convert must not touch the data bytes")
  }

  test("footer stats are exact: numeric/date/timestamp prune, row " +
      "counts match, strings stay fail-open") {
    val t = tmp()
    // two disjoint id eras in separate files
    (1L to 100L).map(i => (i, s"a$i")).toDF("id", "s")
      .coalesce(1).write.parquet(t)
    (101L to 200L).map(i => (i, s"b$i")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(t)
    Snapshots.convert(spark, t)
    val (kept, skipped) =
      Snapshots.pruneFiles(spark, t, col("id") === 5L)
    assert(kept.size == 1 && skipped.size == 1,
      s"footer id stats must prune the other era: kept=$kept")
    // string predicates keep every file (footer string stats are
    // deliberately not taken — bounds may be writer-truncated)
    val (keptS, skippedS) =
      Snapshots.pruneFiles(spark, t, col("s") === "a5")
    assert(skippedS.isEmpty,
      s"string stats must stay fail-open after convert: $skippedS")
    assert(keptS.size == 2)
  }

  test("a converted table is a full citizen: DML, compact, vacuum " +
      "reclaim the original files") {
    val t = tmp()
    fixture(t)
    Snapshots.convert(spark, t)
    Snapshots.deleteWhere(spark, t, col("id") > 150L)
    Snapshots.merge(spark, t,
      Seq((1L, -1.0, "upd", java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
        .toDF("id", "v", "s", "d", "ts"), Seq("id"))
    Snapshots.compact(spark, t, 1)
    Snapshots.vacuum(spark, t, keepVersions = 1)
    val got = Snapshots.read(spark, t)
    assert(got.count() == 150L)
    assert(got.filter(col("id") === 1L).head().getString(2) == "upd")
    // the converted originals were rewritten by compact and then
    // reclaimed by vacuum (they are root-relative, hence owned)
    val loose = new java.io.File(t).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(loose.isEmpty,
      s"vacuum must reclaim the converted originals: ${loose.toSeq}")
  }

  test("refusals: already converted, hive partitions, duplicate " +
      "basenames, non-parquet files") {
    val t = tmp()
    fixture(t)
    Snapshots.convert(spark, t)
    val e1 = intercept[IllegalArgumentException](
      Snapshots.convert(spark, t))
    assert(e1.getMessage.contains("already a snapshot table"))
    val hp = tmp()
    (1L to 10L).map(i => (i, i % 2)).toDF("id", "p")
      .write.partitionBy("p").parquet(hp)
    val e2 = intercept[IllegalArgumentException](
      Snapshots.convert(spark, hp))
    assert(e2.getMessage.contains("hive-partitioned"))
    val dup = tmp()
    Seq((1L, "a")).toDF("id", "s").coalesce(1)
      .write.parquet(dup + "/sub1")
    val part = new java.io.File(dup + "/sub1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(dup + "/sub2"))
    Files.copy(part.toPath, Paths.get(dup + "/sub2/" + part.getName),
      StandardCopyOption.REPLACE_EXISTING)
    val e3 = intercept[IllegalArgumentException](
      Snapshots.convert(spark, dup))
    assert(e3.getMessage.contains("duplicate file basenames"))
    val csv = tmp()
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.parquet(csv)
    Files.write(Paths.get(csv + "/stray.csv"), "1,a\n".getBytes("UTF-8"))
    val e4 = intercept[IllegalArgumentException](
      Snapshots.convert(spark, csv))
    assert(e4.getMessage.contains("parquet layouts only"))
  }

  test("files with heterogeneous schemas merge: the missing column is " +
      "recorded exactly all-NULL and reads NULL") {
    val t = tmp()
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.parquet(t)
    Seq((2L, "b", 9.0)).toDF("id", "s", "extra")
      .coalesce(1).write.mode("append").parquet(t)
    Snapshots.convert(spark, t)
    val got = Snapshots.read(spark, t).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(got(0).isNullAt(2) && got(1).getDouble(2) == 9.0)
    // the all-null record is prunable: IS NOT NULL skips the old file
    val (kept, skipped) =
      Snapshots.pruneFiles(spark, t, col("extra").isNotNull)
    assert(kept.size == 1 && skipped.size == 1,
      s"exact all-null footer record must prune: kept=$kept")
  }

  test("timestamp footer stats round-trip under a NON-UTC session " +
      "timezone: no wrong pruning") {
    // stats strings cast back under the READER's session timezone at
    // prune time — a hard-coded-UTC rendering would shift the bounds
    // by the zone offset and prune files that contain matching rows
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    val prevTsType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    // Spark's legacy default INT96 timestamps carry no usable footer
    // stats (deprecated ordering — convert fails open there); the
    // modern annotated micros are what external writers produce
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    try {
      val t = tmp()
      spark.sql(
        """SELECT id, CAST(ts AS TIMESTAMP) AS ts FROM VALUES
          |  (1L, '2024-06-01 09:00:00'),
          |  (2L, '2024-06-01 10:00:00') AS v(id, ts)""".stripMargin)
        .coalesce(1).write.parquet(t)
      spark.sql(
        """SELECT id, CAST(ts AS TIMESTAMP) AS ts FROM VALUES
          |  (3L, '2024-07-01 09:00:00') AS v(id, ts)""".stripMargin)
        .coalesce(1).write.mode("append").parquet(t)
      Snapshots.convert(spark, t)
      // an equality probe at a real instant must keep its file...
      val (kept, _) = Snapshots.pruneFiles(spark, t,
        col("ts") === expr("CAST('2024-06-01 09:00:00' AS TIMESTAMP)"))
      assert(kept.size == 1,
        s"the June file holds a matching row and must be kept: $kept")
      assert(Snapshots.read(spark, t)
        .filter(col("ts") === expr(
          "CAST('2024-06-01 09:00:00' AS TIMESTAMP)")).count() == 1)
      // ...and the July file is genuinely prunable (stats live)
      val (_, skipped) = Snapshots.pruneFiles(spark, t,
        col("ts") < expr("CAST('2024-06-15 00:00:00' AS TIMESTAMP)"))
      assert(skipped.size == 1, s"July must prune: skipped=$skipped")
    } finally {
      spark.conf.set("spark.sql.session.timeZone", prevTz)
      spark.conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
    }
  }

  test("footer stats match columns case-insensitively: a file whose " +
      "casing differs is not falsely recorded all-NULL") {
    val t = tmp()
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.parquet(t)
    Seq((100L, "b")).toDF("ID", "s").coalesce(1)
      .write.mode("append").parquet(t)
    Snapshots.convert(spark, t)
    // a false all-null record for the ID file would prune it on ANY
    // id predicate — the row would silently vanish from filtered reads
    val (kept, _) = Snapshots.pruneFiles(spark, t, col("id") === 100L)
    assert(kept.size == 1,
      s"the upper-case file holds id=100 and must be kept: $kept")
    assert(Snapshots.read(spark, t).filter(col("id") === 100L)
      .count() == 1)
  }

  test("CALL convert: the SQL surface") {
    val w = Files.createTempDirectory("graft_cv_wh").toFile.toString
    spark.conf.set("spark.sql.catalog.gcv", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcv.warehouse", w)
    // the parquet directory already sits where the catalog expects
    // the table — convert manifests it in place, then SQL reads it
    (1L to 50L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(2).write.parquet(s"$w/default/ct")
    val row = spark.sql(
      "CALL gcv.system.convert(table => 'default.ct')").collect().head
    assert(row.getAs[Number]("version").intValue == 1)
    assert(row.getAs[Number]("rows").longValue == 50L)
    assert(spark.sql("SELECT sum(id) FROM gcv.default.ct")
      .head().getLong(0) == (1L to 50L).sum)
  }
}
