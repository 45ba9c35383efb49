package graft

import java.nio.file.Files

import graft.ops.Snapshots

/** Version tags — named immutable refs: `VERSION AS OF '<name>'`
  * reads the tagged snapshot, and vacuum NEVER drops a tagged
  * version (the override is dropTag, never a maintenance flag). */
class TagsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_tag_wh").toFile.toString
    spark.conf.set("spark.sql.catalog.gt", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gt.warehouse", w)
    w
  }

  private def dirOf(t: String) = s"$warehouse/default/$t"

  test("VERSION AS OF a tag reads the pinned snapshot; names are " +
      "immutable and non-numeric") {
    warehouse
    spark.sql("CREATE TABLE gt.default.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gt.default.t VALUES (1, 'a')") // v2
    spark.sql("CALL gt.system.create_tag('default.t', 'first_load')")
    spark.sql("INSERT INTO gt.default.t VALUES (2, 'b')") // v3
    assert(spark.sql(
      "SELECT count(*) FROM gt.default.t VERSION AS OF 'first_load'")
      .head().getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM gt.default.t")
      .head().getLong(0) == 2)
    // immutable: same name refuses until dropped
    val dup = intercept[Exception] {
      Snapshots.createTag(spark, dirOf("t"), "first_load")
    }
    assert(dup.getMessage.contains("immutable"), dup.getMessage)
    // numeric names would be ambiguous with version numbers
    val num = intercept[Exception] {
      Snapshots.createTag(spark, dirOf("t"), "42")
    }
    assert(num.getMessage.contains("digits"), num.getMessage)
    // unknown tag names the available ones
    val unk = intercept[Exception] {
      spark.sql("SELECT * FROM gt.default.t VERSION AS OF 'nope'")
        .collect()
    }
    assert(unk.getMessage.contains("first_load"), unk.getMessage)
    // drop frees the name and the version becomes plain again
    spark.sql("CALL gt.system.drop_tag('default.t', 'first_load')")
    Snapshots.createTag(spark, dirOf("t"), "first_load", version = 3)
    assert(spark.sql(
      "SELECT count(*) FROM gt.default.t VERSION AS OF 'first_load'")
      .head().getLong(0) == 2)
  }

  test("vacuum never drops a tagged version; dropTag releases it") {
    warehouse
    val dir = dirOf("vt")
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), dir) // v1
    Snapshots.append(Seq((2L, "b")).toDF("k", "v"), dir) // v2
    Snapshots.append(Seq((3L, "c")).toDF("k", "v"), dir) // v3
    Snapshots.createTag(spark, dir, "keep_me", version = 1,
      note = "the training snapshot")
    // a delta chain retains its whole base anyway — compact to a full
    // manifest (v4) so the chain releases v1..v3 and the vacuum has a
    // real drop candidate set
    Snapshots.compact(spark, dir, 1) // v4
    // keep only the newest: v1 survives anyway (tagged), v2/v3 drop
    val (dropped, _) = Snapshots.vacuum(spark, dir, keepVersions = 1)
    assert(dropped >= 1, s"expected a drop, got $dropped")
    assert(Snapshots.versions(spark, dir).contains(1), "tagged v1 kept")
    assert(Snapshots.read(spark, dir, 1).count() == 1) // fully readable
    // force does NOT override a tag — only dropTag does
    Snapshots.vacuum(spark, dir, keepVersions = 1, force = true)
    assert(Snapshots.versions(spark, dir).contains(1))
    assert(Snapshots.dropTag(spark, dir, "keep_me"))
    val (d2, _) = Snapshots.vacuum(spark, dir, keepVersions = 1)
    assert(d2 >= 1 && !Snapshots.versions(spark, dir).contains(1))
  }

  test("ref names are plain marker names: path-shaped and dot-prefixed " +
      "names refuse everywhere") {
    warehouse
    spark.sql("CREATE TABLE gt.default.rn (k BIGINT)")
    spark.sql("INSERT INTO gt.default.rn VALUES (1)")
    val dir = dirOf("rn")
    // a traversal-shaped name must never reach the filesystem — a
    // drop of '../2.manifest' would delete table history
    val t1 = intercept[Exception] {
      Snapshots.dropTag(spark, dir, "../2.manifest")
    }
    assert(t1.getMessage.contains("tag name"), t1.getMessage)
    val t2 = intercept[Exception] {
      Snapshots.clearConsumerFloor(spark, dir, "../../etc")
    }
    assert(t2.getMessage.contains("consumer name"), t2.getMessage)
    // dot-prefixed names would be invisible to the listings (temp
    // markers) — a tag that lists nowhere protects nothing
    val t3 = intercept[Exception] {
      Snapshots.createTag(spark, dir, ".prod")
    }
    assert(t3.getMessage.contains("tag name"), t3.getMessage)
    // versionOfTag on a bad name is a miss, not a read
    assert(Snapshots.versionOfTag(spark, dir, "../1.manifest").isEmpty)
  }

  test("vacuum dry_run prices the sweep without deleting anything") {
    warehouse
    val dir = dirOf("dr")
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), dir) // v1
    Snapshots.append(Seq((2L, "b")).toDF("k", "v"), dir) // v2
    Snapshots.compact(spark, dir, 1)                     // v3 (full)
    val before = Snapshots.versions(spark, dir)
    val (wouldDrop, wouldDelete) =
      Snapshots.vacuum(spark, dir, keepVersions = 1, dryRun = true)
    assert(wouldDrop >= 2 && wouldDelete >= 2,
      s"dry run priced ($wouldDrop, $wouldDelete)")
    // NOTHING changed: same versions, every one still readable
    assert(Snapshots.versions(spark, dir) == before)
    assert(Snapshots.read(spark, dir, 1).count() == 1)
    // the real sweep then deletes exactly what the dry run priced
    spark.conf.set("spark.sql.catalog.gt", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gt.warehouse", warehouse)
    val real = spark.sql(
      "CALL gt.system.vacuum(table => 'default.dr', keep_versions => 1)")
      .head()
    assert(real.getInt(0) == wouldDrop && real.getInt(1) == wouldDelete,
      s"real sweep ${(real.getInt(0), real.getInt(1))} != dry run " +
        s"${(wouldDrop, wouldDelete)}")
  }

  test("the path reader's versionAsOf accepts a tag name") {
    warehouse
    val dir = dirOf("pr")
    Snapshots.append(Seq((1L, "a")).toDF("k", "v"), dir) // v1
    Snapshots.createTag(spark, dir, "snap1")
    Snapshots.append(Seq((2L, "b")).toDF("k", "v"), dir) // v2
    assert(spark.read.format("graft-snapshots")
      .option("versionAsOf", "snap1").load(dir).count() == 1)
    val e = intercept[Exception] {
      spark.read.format("graft-snapshots")
        .option("versionAsOf", "missing_tag").load(dir).count()
    }
    assert(e.getMessage.contains("snap1"), e.getMessage)
  }

  test("CALL tags lists name/version/note") {
    warehouse
    spark.sql("CREATE TABLE gt.default.ls (k BIGINT)")
    spark.sql("INSERT INTO gt.default.ls VALUES (1)")
    spark.sql(
      "CALL gt.system.create_tag('default.ls', 'a', note => 'why')")
    spark.sql("CALL gt.system.create_tag('default.ls', 'b')")
    val rows = spark.sql("CALL gt.system.tags('default.ls')")
      .select("name", "version", "note")
      .as[(String, Int, String)].collect().toSeq.sortBy(_._1)
    assert(rows.map(r => (r._1, r._3)) == Seq(("a", "why"), ("b", "")),
      rows)
  }
}
