package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Snapshots

/** ADD COLUMN ... DEFAULT — metadata-only schema evolution where
  * pre-evolution files materialize the pinned literal SCAN-SIDE
  * (Spark's `EXISTS_DEFAULT` field metadata drives the parquet
  * readers' missing-column fill), post-evolution INSERTs that omit
  * the column fill from `CURRENT_DEFAULT`, and explicit values
  * (NULL included) always win because their files HAVE the column. */
class ColumnDefaultSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_def").toFile.toString + "/t"

  test("pre-evolution rows read the default; explicit values and " +
      "NULLs written after the add win; time travel keeps the shape") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    val v2 = Snapshots.addColumn(spark, root, "n", IntegerType,
      Some("40 + 2")) // constant EXPRESSION folds to the pinned literal
    assert(v2 == 2)
    assert(Snapshots.read(spark, root)
      .select("k", "n").as[(Long, Option[Int])].collect().toMap ==
      Map(1L -> Some(42), 2L -> Some(42)))
    // post-evolution rows with explicit values — NULL included — win
    Snapshots.append(Seq((3L, "c", Some(7)), (4L, "d", None: Option[Int]))
      .toDF("k", "v", "n"), root)
    assert(Snapshots.read(spark, root)
      .select("k", "n").as[(Long, Option[Int])].collect().toMap ==
      Map(1L -> Some(42), 2L -> Some(42), 3L -> Some(7), 4L -> None))
    // a post-evolution append that OMITS the column also reads the
    // default — its files lack the column, same scan-side fill
    Snapshots.append(Seq((5L, "e")).toDF("k", "v"), root)
    assert(Snapshots.read(spark, root).filter(col("k") === 5)
      .select("n").as[Option[Int]].head().contains(42))
    // time travel: the pre-evolution version has no such column
    assert(Snapshots.read(spark, root, 1).columns.toSeq == Seq("k", "v"))
    // filters over the default behave (stats for pre-evolution files
    // are absent for n — pruning fails open, rows still correct)
    assert(Snapshots.read(spark, root).filter(col("n") === 42)
      .select("k").as[Long].collect().toSet == Set(1L, 2L, 5L))
    assert(Snapshots.read(spark, root).filter(col("n").isNull)
      .select("k").as[Long].collect().toSeq == Seq(4L))
  }

  test("defaults survive DML rewrites and ride the change feed") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), root)
    Snapshots.addColumn(spark, root, "tag", StringType, Some("'new'"))
    // a CoW update rewrites file 1 under the CURRENT schema — the
    // rewritten file now HAS the column, materialized at the default
    Snapshots.updateWhere(spark, root, col("k") === 1,
      Seq("v" -> lit(9.0)))
    assert(Snapshots.read(spark, root)
      .select("k", "tag").as[(Long, String)].collect().toMap ==
      Map(1L -> "new", 2L -> "new"))
    val feed = Snapshots.changeFeed(spark, root, 0)
    // the feed's update images carry the materialized default too
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select("k", "tag").as[(Long, String)].collect().toSeq ==
      Seq((1L, "new")))
  }

  test("CHECK enforcement sees the DEFAULT a lacking column will " +
      "read — a NULL stand-in would let a violating row commit") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.addColumn(spark, root, "n", IntegerType, Some("5"))
    // existing rows read n=5 and k<10: the constraint holds
    Snapshots.setConstraint(spark, root, "kc", "k < 10 OR n > 100")
    // a frame omitting n with k=20: its rows will READ n=5, so the
    // CHECK is violated (20<10 OR 5>100 = false) — must refuse.
    // With a NULL stand-in the predicate evaluated UNKNOWN and the
    // violating row committed silently.
    val e = intercept[IllegalArgumentException] {
      Snapshots.append(Seq((20L, "z")).toDF("k", "v"), root)
    }
    assert(e.getMessage.contains("kc"), e.getMessage)
    // an in-bounds row omitting n still appends fine
    Snapshots.append(Seq((2L, "b")).toDF("k", "v"), root)
    assert(Snapshots.read(spark, root).count() == 2)
  }

  test("mergeSchema fills a LACKING source column with its DEFAULT, " +
      "matching every other omitted-column write path") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.addColumn(spark, root, "tier", StringType, Some("'std'"))
    try {
      spark.conf.set("spark.graft.write.mergeSchema", "true")
      Snapshots.merge(spark, root, Seq((2L, "b")).toDF("k", "v"),
        Seq("k"))
    } finally spark.conf.unset("spark.graft.write.mergeSchema")
    assert(Snapshots.read(spark, root)
      .select("k", "tier").as[(Long, String)].collect().toMap ==
      Map(1L -> "std", 2L -> "std"))
  }

  test("the default survives RENAME COLUMN and integral widening") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.addColumn(spark, root, "n", IntegerType, Some("7"))
    Snapshots.renameColumn(spark, root, "n", "num")
    assert(Snapshots.read(spark, root)
      .select("num").as[Option[Int]].head().contains(7))
    Snapshots.widenColumn(spark, root, "num", LongType)
    assert(Snapshots.read(spark, root)
      .select("num").as[Option[Long]].head().contains(7L))
  }

  test("nondeterministic, row-dependent and ill-typed defaults refuse") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), root)
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, root, "r", DoubleType, Some("rand()"))
    }
    assert(e1.getMessage.contains("deterministic"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, root, "x", IntegerType, Some("k + 1"))
    }
    assert(e2.getMessage.contains("DEFAULT"), e2.getMessage)
    // evaluation-time leaves fold to ONE DDL-instant value while the
    // INSERT default would re-evaluate per statement — refused
    val e3 = intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, root, "ts", TimestampType,
        Some("current_timestamp()"))
    }
    assert(e3.getMessage.contains("literals"), e3.getMessage)
    // a parsable-but-ill-typed default refuses with the column named
    // (never a bare cast error, never a silently pinned NULL)
    val e4 = intercept[IllegalArgumentException] {
      Snapshots.addColumn(spark, root, "m", IntegerType, Some("'abc'"))
    }
    assert(e4.getMessage.contains("ADD COLUMN m"), e4.getMessage)
    // still no column landed
    assert(Snapshots.read(spark, root).columns.toSeq == Seq("k", "v"))
  }

  test("SET / DROP DEFAULT govern future INSERTs only — nothing " +
      "retroactive, and evaluation-time expressions are allowed") {
    val root = freshRoot()
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), root)
    Snapshots.addColumn(spark, root, "n", IntegerType) // NO default
    // pre-SET state: the old row reads NULL and must KEEP reading
    // NULL after SET DEFAULT (the pin at column creation governs)
    Snapshots.setColumnDefault(spark, root, "n", Some("9"))
    assert(Snapshots.read(spark, root)
      .select("n").as[Option[Int]].head().isEmpty)
    // constant expressions re-pin the INSERT default freely
    Snapshots.setColumnDefault(spark, root, "n", Some("5 + 4"))
    // rand() still refuses
    val e = intercept[IllegalArgumentException] {
      Snapshots.setColumnDefault(spark, root, "n", Some("rand()"))
    }
    assert(e.getMessage.contains("deterministic"), e.getMessage)
    // DROP removes the INSERT default; dropping twice refuses
    Snapshots.setColumnDefault(spark, root, "n", None)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.setColumnDefault(spark, root, "n", None)
    }
    assert(e2.getMessage.contains("no DEFAULT"), e2.getMessage)
  }

  test("SQL: ALTER COLUMN SET DEFAULT fills subsequent INSERTs; " +
      "DROP DEFAULT reverts them to NULL") {
    spark.conf.set("spark.sql.catalog.gdef2", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef2.warehouse",
      Files.createTempDirectory("graft_defwh2").toFile.toString)
    spark.sql("CREATE TABLE gdef2.default.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gdef2.default.t (id) VALUES (1)")
    spark.sql("""ALTER TABLE gdef2.default.t
      ALTER COLUMN s SET DEFAULT 'filled'""")
    spark.sql("INSERT INTO gdef2.default.t (id) VALUES (2)")
    spark.sql("ALTER TABLE gdef2.default.t ALTER COLUMN s DROP DEFAULT")
    spark.sql("INSERT INTO gdef2.default.t (id) VALUES (3)")
    assert(spark.sql("SELECT id, s FROM gdef2.default.t ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq == Seq(
        (1L, None), (2L, Some("filled")), (3L, None)))
    // a time-valued INSERT default is accepted and lands non-null
    spark.sql("""ALTER TABLE gdef2.default.t
      ADD COLUMN ingested TIMESTAMP""")
    spark.sql("""ALTER TABLE gdef2.default.t
      ALTER COLUMN ingested SET DEFAULT current_timestamp()""")
    spark.sql("INSERT INTO gdef2.default.t (id) VALUES (4)")
    assert(spark.sql(
      "SELECT ingested IS NOT NULL FROM gdef2.default.t WHERE id = 4")
      .as[Boolean].head())
  }

  test("SQL surface: CREATE ... DEFAULT, INSERT omitting the column, " +
      "ALTER TABLE ADD COLUMN ... DEFAULT") {
    spark.conf.set("spark.sql.catalog.gdef", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse",
      Files.createTempDirectory("graft_defwh").toFile.toString)
    spark.sql("""CREATE TABLE gdef.default.t
      (id BIGINT, status STRING DEFAULT 'open')""")
    spark.sql("INSERT INTO gdef.default.t (id) VALUES (1)")
    spark.sql("INSERT INTO gdef.default.t VALUES (2, 'closed')")
    spark.sql("INSERT INTO gdef.default.t VALUES (3, NULL)")
    assert(spark.sql("SELECT id, status FROM gdef.default.t ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq == Seq(
        (1L, Some("open")), (2L, Some("closed")), (3L, None)))
    // ALTER ... ADD COLUMN DEFAULT: rows 1..3 predate the column and
    // read the pinned literal
    spark.sql("""ALTER TABLE gdef.default.t
      ADD COLUMN score DOUBLE DEFAULT 1.5""")
    spark.sql("INSERT INTO gdef.default.t VALUES (4, 'x', 2.5)")
    assert(spark.sql("SELECT id, score FROM gdef.default.t ORDER BY id")
      .as[(Long, Option[Double])].collect().toSeq == Seq(
        (1L, Some(1.5)), (2L, Some(1.5)), (3L, Some(1.5)),
        (4L, Some(2.5))))
    // the DEFAULT keyword in VALUES resolves too
    spark.sql("INSERT INTO gdef.default.t VALUES (5, DEFAULT, DEFAULT)")
    assert(spark.sql(
      "SELECT status, score FROM gdef.default.t WHERE id = 5")
      .as[(Option[String], Option[Double])].head() ==
      ((Some("open"), Some(1.5))))
  }
}
