package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** GENERATED ALWAYS AS columns — writer-side materialization.
  *
  * The pinned schema carries Spark's `GENERATION_EXPRESSION` field
  * metadata (the same CatalogV2Util round-trip as the column-DEFAULT
  * keys); every data write STORES the computed value, so files are
  * self-contained: readers, time travel, clones and external parquet
  * consumers see attained values, and the column's per-file stats
  * prune filters on it like any stored key. Write contract: a NULL
  * slot (omitted, Spark-filled, or explicit) means "compute"; a
  * non-NULL slot must AGREE with the expression or the commit
  * refuses; UPDATE-family rewrites recompute after assignments land.
  */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_gen_wh").toFile.toString
    spark.conf.set("spark.sql.catalog.gg", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gg.warehouse", w)
    w
  }

  private def dirOf(t: String) = s"$warehouse/default/$t"

  test("CREATE + INSERT: omitted, explicit-NULL and agreeing values " +
      "all land computed; disagreeing values refuse") {
    warehouse
    spark.sql(
      """CREATE TABLE gg.default.ev (
        |  ts TIMESTAMP,
        |  v DOUBLE,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""".stripMargin)
    // INSERT omitting the column entirely (column list)
    spark.sql(
      "INSERT INTO gg.default.ev (ts, v) VALUES " +
        "(TIMESTAMP '2024-03-05 10:00:00', 1.0)")
    // full-width INSERT with an explicit NULL slot → computed
    spark.sql(
      "INSERT INTO gg.default.ev VALUES " +
        "(TIMESTAMP '2024-03-06 23:59:59', 2.0, NULL)")
    // full-width INSERT with an AGREEING explicit value → kept
    spark.sql(
      "INSERT INTO gg.default.ev VALUES " +
        "(TIMESTAMP '2024-03-07 00:00:01', 3.0, DATE '2024-03-07')")
    assert(spark.sql("SELECT v, CAST(day AS STRING) FROM gg.default.ev ORDER BY v")
      .as[(Double, String)].collect().toSeq ==
      Seq((1.0, "2024-03-05"), (2.0, "2024-03-06"), (3.0, "2024-03-07")))
    // a DISAGREEING explicit value refuses, nothing committed
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gg.default.ev VALUES " +
        "(TIMESTAMP '2024-03-08 00:00:01', 4.0, DATE '1999-01-01')")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM gg.default.ev")
      .head().getLong(0) == 3)
  }

  test("UPDATE recomputes after assignments; assigning the generated " +
      "column refuses") {
    warehouse
    spark.sql(
      """CREATE TABLE gg.default.up (
        |  k BIGINT, ts TIMESTAMP,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""".stripMargin)
    spark.sql("INSERT INTO gg.default.up (k, ts) VALUES " +
      "(1, TIMESTAMP '2024-01-01 01:00:00')," +
      "(2, TIMESTAMP '2024-02-02 02:00:00')")
    spark.sql("UPDATE gg.default.up SET ts = TIMESTAMP '2024-06-15 12:00:00' " +
      "WHERE k = 1")
    assert(spark.sql(
      "SELECT k, CAST(day AS STRING) FROM gg.default.up ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "2024-06-15"), (2L, "2024-02-02")))
    val e = intercept[Exception] {
      spark.sql("UPDATE gg.default.up SET day = DATE '1999-01-01' WHERE k = 2")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS"), e.getMessage)
  }

  test("MERGE: UPDATE action recomputes from the post-assignment row; " +
      "INSERT action computes; SET of the generated column refuses") {
    warehouse
    spark.sql(
      """CREATE TABLE gg.default.mg (
        |  k BIGINT, ts TIMESTAMP, v DOUBLE,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""".stripMargin)
    spark.sql("INSERT INTO gg.default.mg (k, ts, v) VALUES " +
      "(1, TIMESTAMP '2024-01-01 01:00:00', 1.0)," +
      "(2, TIMESTAMP '2024-02-02 02:00:00', 2.0)")
    spark.sql(
      """MERGE INTO gg.default.mg t
        |USING (SELECT 1L AS k, TIMESTAMP '2024-09-09 09:00:00' AS ts
        |       UNION ALL
        |       SELECT 3L, TIMESTAMP '2024-10-10 10:00:00') s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET ts = s.ts
        |WHEN NOT MATCHED THEN INSERT (k, ts, v) VALUES (s.k, s.ts, 9.0)
        |""".stripMargin)
    assert(spark.sql(
      "SELECT k, CAST(day AS STRING) FROM gg.default.mg ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "2024-09-09"), (2L, "2024-02-02"), (3L, "2024-10-10")))
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO gg.default.mg t
          |USING (SELECT 2L AS k) s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET day = DATE '1999-01-01'
          |""".stripMargin)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS"), e.getMessage)
  }

  test("DDL guards: rename/drop/widen of a referenced base column " +
      "refuse; dropping the generated column itself is fine; " +
      "SET DEFAULT on a generated column refuses") {
    warehouse
    spark.sql(
      """CREATE TABLE gg.default.dd (
        |  a INT, b INT, s STRING,
        |  tot BIGINT GENERATED ALWAYS AS (CAST(a AS BIGINT) + b))""".stripMargin)
    spark.sql("INSERT INTO gg.default.dd (a, b, s) VALUES (1, 2, 'x')")
    val r = intercept[Exception] {
      spark.sql("ALTER TABLE gg.default.dd RENAME COLUMN a TO a2")
    }
    assert(r.getMessage.contains("GENERATED ALWAYS AS"), r.getMessage)
    val d = intercept[Exception] {
      spark.sql("ALTER TABLE gg.default.dd DROP COLUMN b")
    }
    assert(d.getMessage.contains("GENERATED ALWAYS AS"), d.getMessage)
    val w = intercept[Exception] {
      spark.sql("ALTER TABLE gg.default.dd ALTER COLUMN a TYPE BIGINT")
    }
    assert(w.getMessage.contains("GENERATED ALWAYS AS"), w.getMessage)
    val sd = intercept[Exception] {
      spark.sql("ALTER TABLE gg.default.dd ALTER COLUMN tot SET DEFAULT 7")
    }
    assert(sd.getMessage.contains("GENERATED"), sd.getMessage)
    // an unreferenced column stays fully evolvable
    spark.sql("ALTER TABLE gg.default.dd RENAME COLUMN s TO s2")
    // dropping the generated column itself: the expression leaves
    // with the field, and the base becomes evolvable again
    spark.sql("ALTER TABLE gg.default.dd DROP COLUMN tot")
    spark.sql("ALTER TABLE gg.default.dd RENAME COLUMN a TO a2")
    assert(spark.sql("SELECT a2, b FROM gg.default.dd").as[(Int, Int)]
      .collect().toSeq == Seq((1, 2)))
  }

  test("a generated column can be the declared cluster key: " +
      "PARTITIONED BY (day) clusters ingests on the computed value " +
      "and day-filters prune files") {
    warehouse
    spark.sql(
      """CREATE TABLE gg.default.cl (
        |  ts TIMESTAMP, v DOUBLE,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
        |PARTITIONED BY (day)""".stripMargin)
    val dir = dirOf("cl")
    // one multi-day ingest, shuffled: cluster-on-write must
    // range-partition on the COMPUTED day (materialization runs
    // before clustering)
    val rows = spark.range(0, 300, 1, 4).selectExpr(
      "timestampadd(DAY, CAST(id % 30 AS INT), " +
        "TIMESTAMP '2024-01-01 00:00:00') AS ts",
      "CAST(id AS DOUBLE) AS v")
    Snapshots.append(rows, dir)
    // a one-day predicate must open a strict subset of the files
    val (kept, untouched) = Snapshots.pruneFiles(spark, dir,
      col("day") === java.sql.Date.valueOf("2024-01-15"))
    assert(kept.nonEmpty, "some file holds the day")
    assert(untouched.nonEmpty,
      "clustered ingest must let day-filters skip files")
    // and the values are right
    assert(Snapshots.read(spark, dir)
      .filter(col("day") === java.sql.Date.valueOf("2024-01-15"))
      .count() == 10)
  }

  test("the change feed's update images carry the RECOMPUTED " +
      "generated value") {
    warehouse
    spark.sql(
      """CREATE TABLE gg.default.cf (
        |  k BIGINT, ts TIMESTAMP,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""".stripMargin)
    spark.sql("INSERT INTO gg.default.cf (k, ts) VALUES " +
      "(1, TIMESTAMP '2024-01-01 08:00:00')")
    spark.sql("UPDATE gg.default.cf SET ts = TIMESTAMP " +
      "'2024-03-03 09:00:00' WHERE k = 1")
    val feed = spark.read.format("graft-snapshots")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(dirOf("cf"))
      .selectExpr("_change_type", "CAST(day AS STRING) AS day")
      .as[(String, String)].collect().toMap
    assert(feed.get("update_preimage").contains("2024-01-01"), feed)
    assert(feed.get("update_postimage").contains("2024-03-03"), feed)
  }

  test("Scala API: append lacking the column gains it computed; " +
      "merge source with NULL slot computes") {
    warehouse
    spark.sql(
      """CREATE TABLE gg.default.sc (
        |  k BIGINT, ts TIMESTAMP,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""".stripMargin)
    val dir = dirOf("sc")
    Snapshots.append(
      Seq((1L, java.sql.Timestamp.valueOf("2024-04-04 04:00:00")))
        .toDF("k", "ts"), dir)
    assert(Snapshots.read(spark, dir).select("day").as[java.sql.Date]
      .head().toString == "2024-04-04")
    // merge: full-width source with a NULL generated slot
    Snapshots.merge(spark, dir,
      Seq((1L, java.sql.Timestamp.valueOf("2024-05-05 05:00:00"),
        null.asInstanceOf[java.sql.Date]))
        .toDF("k", "ts", "day"), Seq("k"))
    assert(Snapshots.read(spark, dir)
      .select("k", "day").as[(Long, java.sql.Date)]
      .collect().toMap.apply(1L).toString == "2024-05-05")
    // the generated column's stats prune filters on it: a predicate
    // no file can satisfy scans zero files
    val (kept, _) = graft.ops.Snapshots.pruneFiles(spark, dir,
      col("day") === java.sql.Date.valueOf("1990-01-01"))
    assert(kept.isEmpty, kept)
  }
}
