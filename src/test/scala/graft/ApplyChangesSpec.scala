package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** APPLY CHANGES INTO + incremental replication. Contracts under
  * test: a CDC batch nets to latest-per-key by sequence (insert
  * outranks delete at equal sequence; preimages drop); the apply is
  * ONE atomic commit; `replicate` follows a source table through the
  * change feed exactly once (the applied mark rides the apply
  * commit), treats maintenance-only windows as metadata-only, and
  * refuses lineage-merging and vacuumed-gap traps loudly. */
class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_ac").toFile.toString + "/t"

  test("applyChanges nets a multi-version batch to latest state per key") {
    val t = tmp()
    Snapshots.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "s"), t)
    val changes = Seq(
      // key 1: updated twice — the later image must win
      (1L, "a1", "update_preimage", 5),
      (1L, "a2", "update_postimage", 5),
      (1L, "a3", "update_postimage", 6),
      // key 2: deleted at the highest sequence — must vanish
      (2L, "b", "delete", 5),
      // key 3: deleted then re-inserted LATER — must survive as new
      (3L, "c", "delete", 5),
      (3L, "c2", "insert", 6),
      // key 5: fresh insert
      (5L, "e", "insert", 6),
      // key 6: delete+insert at the SAME sequence (one commit's
      // upsert decomposition) — the insert must outrank the delete
      (6L, "f", "delete", 7),
      (6L, "f2", "insert", 7)
    ).toDF("id", "s", "_change_type", "_commit_version")
    Snapshots.applyChanges(spark, t, changes, Seq("id"),
      sequenceCol = "_commit_version")
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a3"), (3L, "c2"), (4L, "d"), (5L, "e"), (6L, "f2")))
  }

  test("applyChanges refuses unknown ops and NULL keys") {
    val t = tmp()
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), t)
    val badOp = Seq((1L, "x", "upsert", 1))
      .toDF("id", "s", "_change_type", "_commit_version")
    val e1 = intercept[IllegalArgumentException](
      Snapshots.applyChanges(spark, t, badOp, Seq("id"),
        "_commit_version"))
    assert(e1.getMessage.contains("unknown"))
    val nullKey = Seq((Option.empty[Long], "x", "insert", 1))
      .toDF("id", "s", "_change_type", "_commit_version")
    val e2 = intercept[IllegalArgumentException](
      Snapshots.applyChanges(spark, t, nullKey, Seq("id"),
        "_commit_version"))
    assert(e2.getMessage.contains("NULL key"))
    // a NULL op is a corrupt feed too — it must reach the audit, not
    // silently vanish through the null-unsafe preimage filter
    val nullOp = Seq((1L, "x", Option.empty[String], 1))
      .toDF("id", "s", "_change_type", "_commit_version")
    val e3 = intercept[IllegalArgumentException](
      Snapshots.applyChanges(spark, t, nullOp, Seq("id"),
        "_commit_version"))
    assert(e3.getMessage.contains("unknown"))
  }

  test("applyChanges refuses a NULL sequence and ties at one " +
      "(key, sequence, op) — netting would drop rows arbitrarily") {
    val t = tmp()
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), t)
    val nullSeq = Seq((1L, "x", "insert", Option.empty[Int]))
      .toDF("id", "s", "_change_type", "_commit_version")
    val e1 = intercept[IllegalArgumentException](
      Snapshots.applyChanges(spark, t, nullSeq, Seq("id"),
        "_commit_version"))
    assert(e1.getMessage.contains("NULL _commit_version"))
    // two rows for one key at one (sequence, op): whichever the
    // row_number picked, the other's data would vanish silently —
    // the tie must refuse instead (the plain merge path's contract)
    val tie = Seq((1L, "x", "insert", 3), (1L, "y", "insert", 3))
      .toDF("id", "s", "_change_type", "_commit_version")
    val e2 = intercept[IllegalArgumentException](
      Snapshots.applyChanges(spark, t, tie, Seq("id"),
        "_commit_version"))
    assert(e2.getMessage.contains("share one"))
    // the table is untouched by both refusals
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSeq
      == Seq((1L, "a")))
  }

  test("replicate refuses a source whose keys are not unique instead " +
      "of silently keeping one row per key") {
    // first sync stamps every source row with ONE version and
    // op = insert — a duplicate-keyed source manufactures exactly the
    // tie applyChanges refuses; before the refusal this lost all but
    // one row per key on the replica with no error
    val src = tmp(); val dst = tmp()
    Snapshots.append(Seq((1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("id", "s"), src)
    val e = intercept[IllegalArgumentException](
      Snapshots.replicate(spark, src, dst, Seq("id")))
    assert(e.getMessage.contains("share one"))
    // incremental windows carry the same guarantee: one source commit
    // appending duplicate keys refuses at the next sync
    val src2 = tmp(); val dst2 = tmp()
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), src2)
    Snapshots.replicate(spark, src2, dst2, Seq("id"))
    Snapshots.append(Seq((5L, "x"), (5L, "y")).toDF("id", "s"), src2)
    val e2 = intercept[IllegalArgumentException](
      Snapshots.replicate(spark, src2, dst2, Seq("id")))
    assert(e2.getMessage.contains("share one"))
  }

  test("replicate follows a source through DML exactly once; " +
      "maintenance-only windows advance the mark metadata-only") {
    val src = tmp(); val dst = tmp()
    Snapshots.append((1L to 40L).map(i => (i, i * 10.0)).toDF("id", "v"),
      src)
    // first sync materializes the full content
    val r1 = Snapshots.replicate(spark, src, dst, Seq("id"))
    assert(r1.fromVersion == 0)
    def content(d: String) = Snapshots.read(spark, d)
      .as[(Long, Double)].collect().toSet
    assert(content(dst) == content(src))
    // a replay is a no-op: same mark, no commit
    val r2 = Snapshots.replicate(spark, src, dst, Seq("id"))
    assert(r2.targetVersion == r1.targetVersion &&
      r2.fromVersion == r2.toVersion)
    // mixed DML on the source: append + update + delete
    Snapshots.append(Seq((41L, 410.0), (42L, 420.0)).toDF("id", "v"), src)
    Snapshots.updateMatching(spark, src,
      Seq(7L, 9L).toDF("id"), Seq("id"),
      Seq("v" -> (col("v") + 1000.0)))
    Snapshots.deleteMatching(spark, src,
      Seq(3L, 4L).toDF("id"), Seq("id"))
    val r3 = Snapshots.replicate(spark, src, dst, Seq("id"))
    assert(r3.fromVersion == r1.toVersion && r3.toVersion > r3.fromVersion)
    assert(content(dst) == content(src),
      "the replica must converge to the source's net state")
    // maintenance-only window: optimize contributes zero feed rows —
    // the mark advances without rewriting a byte of the replica
    val dstFilesBefore = Snapshots.read(spark, dst).inputFiles.toSet
    Snapshots.compact(spark, src, 1)
    val r4 = Snapshots.replicate(spark, src, dst, Seq("id"))
    assert(r4.toVersion > r4.fromVersion)
    assert(Snapshots.read(spark, dst).inputFiles.toSet == dstFilesBefore,
      "a maintenance-only replicate must not rewrite replica data")
    assert(content(dst) == content(src))
    // and the advanced mark makes the next run a pure no-op
    val r5 = Snapshots.replicate(spark, src, dst, Seq("id"))
    assert(r5.fromVersion == r5.toVersion)
  }

  test("replicate follows source schema DDL: add-with-default, " +
      "rename, drop, widen — with the in-window slivers exact") {
    val src = tmp(); val dst = tmp()
    Snapshots.append((1L to 10L).map(i =>
      (i, i.toInt, s"b$i", i * 0.5)).toDF("id", "a", "b", "junk"), src)
    Snapshots.replicate(spark, src, dst, Seq("id"))
    // one window containing data-DML interleaved with schema DDL
    Snapshots.updateMatching(spark, src, Seq(1L).toDF("id"), Seq("id"),
      Seq("a" -> lit(111))) // k1 changes BEFORE the add: its post-image
                            // predates column c — must read the default
    Snapshots.updateMatching(spark, src, Seq(2L).toDF("id"), Seq("id"),
      Seq("b" -> lit("zz"))) // k2 changes BEFORE the rename: its value
                             // travels under the OLD name in the feed
    Snapshots.addColumn(spark, src, "c",
      org.apache.spark.sql.types.StringType, Some("'dflt'"))
    Snapshots.renameColumn(spark, src, "b", "b2")
    Snapshots.dropColumn(spark, src, "junk")
    Snapshots.widenColumn(spark, src, "a",
      org.apache.spark.sql.types.LongType)
    Snapshots.updateMatching(spark, src, Seq(3L).toDF("id"), Seq("id"),
      Seq("c" -> lit("explicit"))) // post-add value
    Snapshots.updateMatching(spark, src, Seq(4L).toDF("id"), Seq("id"),
      Seq("c" -> lit(null))) // post-add EXPLICIT NULL: must stay NULL
    Snapshots.append(Seq((11L, 1100L, "b11", "c11"))
      .toDF("id", "a", "b2", "c"), src)
    Snapshots.replicate(spark, src, dst, Seq("id"))
    // shapes converge exactly
    val srcDf = Snapshots.read(spark, src)
    val dstDf = Snapshots.read(spark, dst)
    assert(dstDf.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      srcDf.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"replica schema ${dstDf.schema.sql} != source ${srcDf.schema.sql}")
    // contents converge exactly — including the slivers: k1 reads the
    // default for c (its post-image predates the add), k2's value
    // shows under the renamed column, k4's explicit NULL stays NULL
    val cols = srcDf.columns.sorted.toSeq
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(dstDf) == rows(srcDf))
    val k1 = dstDf.filter(col("id") === 1).select("c").head()
    assert(k1.getString(0) == "dflt",
      "pre-add post-image must read the pinned default on the replica")
    val k2 = dstDf.filter(col("id") === 2).select("b2").head()
    assert(k2.getString(0) == "zz",
      "pre-rename value must surface under the renamed column")
    val k4 = dstDf.filter(col("id") === 4).select("c").head()
    assert(k4.isNullAt(0), "post-add explicit NULL must stay NULL")
  }

  test("replicate: a rename with only PRE-rename changes in the " +
      "window keeps the renamed column's values") {
    val src = tmp(); val dst = tmp()
    Snapshots.append((1L to 5L).map(i => (i, s"b$i")).toDF("id", "b"),
      src)
    Snapshots.replicate(spark, src, dst, Seq("id"))
    // window: data change under the OLD name, then the rename — and
    // NO data commit after it, so the feed schema has only 'b'
    Snapshots.updateMatching(spark, src, Seq(2L).toDF("id"), Seq("id"),
      Seq("b" -> lit("changed")))
    Snapshots.renameColumn(spark, src, "b", "b2")
    Snapshots.replicate(spark, src, dst, Seq("id"))
    val got = Snapshots.read(spark, dst)
      .filter(col("id") === 2).select("b2").head().getString(0)
    assert(got == "changed",
      "the pre-rename post-image must keep its value under the new name")
  }

  test("replicate: a rename CHAIN that re-owns a freed name in one " +
      "window (a→b, c→a) keeps the two columns' data apart") {
    // the feed unions by NAME, so a re-owned name's column mixes two
    // physical columns' values split by commit version: pre-rename
    // rows hold the FIRST column's data under 'a', post-rename rows
    // the second's. An unbounded read would bleed one into the other
    // in both directions — a post-rename explicit NULL in 'b' must
    // not coalesce into the re-owned 'a' values, and a pre-rename row
    // must not surface the first column's data under the second.
    val src = tmp(); val dst = tmp()
    Snapshots.append((1L to 5L).map(i => (i, s"a$i", s"c$i"))
      .toDF("id", "a", "c"), src)
    Snapshots.replicate(spark, src, dst, Seq("id"))
    // pre-rename data change: k2's post-image travels under old 'a'
    Snapshots.updateMatching(spark, src, Seq(2L).toDF("id"), Seq("id"),
      Seq("a" -> lit("changed")))
    Snapshots.renameColumn(spark, src, "a", "b")
    Snapshots.renameColumn(spark, src, "c", "a") // re-owns the name
    // post-rename data for the re-owned column
    Snapshots.updateMatching(spark, src, Seq(3L).toDF("id"), Seq("id"),
      Seq("a" -> lit("n3")))
    // post-rename EXPLICIT NULL in b, live value in the re-owned a on
    // the same row — the coalesce-bleed bait
    Snapshots.updateMatching(spark, src, Seq(4L).toDF("id"), Seq("id"),
      Seq("b" -> lit(null), "a" -> lit("x4")))
    Snapshots.replicate(spark, src, dst, Seq("id"))
    val srcDf = Snapshots.read(spark, src)
    val dstDf = Snapshots.read(spark, dst)
    assert(dstDf.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      srcDf.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"replica schema ${dstDf.schema.sql} != source ${srcDf.schema.sql}")
    val cols = srcDf.columns.sorted.toSeq
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(dstDf) == rows(srcDf),
      s"replica diverged: ${rows(dstDf)} vs ${rows(srcDf)}")
    val k4 = dstDf.filter(col("id") === 4).select("b", "a").head()
    assert(k4.isNullAt(0),
      "k4's explicit NULL under 'b' must stay NULL, not bleed the " +
        "re-owned 'a' column's value through an unbounded read")
    assert(k4.getString(1) == "x4")
    val k2 = dstDf.filter(col("id") === 2).select("b", "a").head()
    assert(k2.getString(0) == "changed",
      "the pre-rename post-image must keep its value under 'b'")
    assert(k2.getString(1) == "c2",
      "k2's pre-rename post-image must show its ORIGINAL second " +
        "column under the re-owned name, not the first column's data")
    val k3 = dstDf.filter(col("id") === 3).select("a", "b").head()
    assert(k3.getString(0) == "n3" && k3.getString(1) == "a3")
  }

  test("replicate: a DOUBLE rename (a→x→b) in one window keeps data " +
      "committed under the intermediate name") {
    // the feed unions by name, so an x-era row carries its value only
    // under column x — a coalesce(new, old) read would silently NULL
    // it; the era-bounded projection must read each commit's own name
    val src = tmp(); val dst = tmp()
    Snapshots.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "a"),
      src)
    Snapshots.replicate(spark, src, dst, Seq("id"))
    Snapshots.updateMatching(spark, src, Seq(2L).toDF("id"), Seq("id"),
      Seq("a" -> lit("va"))) // a-era data
    Snapshots.renameColumn(spark, src, "a", "x")
    Snapshots.updateMatching(spark, src, Seq(3L).toDF("id"), Seq("id"),
      Seq("x" -> lit("vx"))) // INTERMEDIATE-era data
    Snapshots.renameColumn(spark, src, "x", "b")
    Snapshots.updateMatching(spark, src, Seq(4L).toDF("id"), Seq("id"),
      Seq("b" -> lit("vb"))) // final-era data
    Snapshots.replicate(spark, src, dst, Seq("id"))
    val got = Snapshots.read(spark, dst).orderBy("id")
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.toSeq == Seq(1L -> "v1", 2L -> "va", 3L -> "vx",
      4L -> "vb", 5L -> "v5"),
      s"intermediate-era value lost: ${got.toSeq}")
    val cols = Snapshots.read(spark, src).columns.sorted.toSeq
    def rows(d: String) = Snapshots.read(spark, d)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(dst) == rows(src))
  }

  test("replicate bootstraps from a created-but-EMPTY source") {
    val src = tmp(); val dst = tmp()
    Snapshots.createTable(spark, src,
      Seq((1L, "x")).toDF("id", "s").schema)
    val r = Snapshots.replicate(spark, src, dst, Seq("id"))
    assert(Snapshots.read(spark, dst).count() == 0,
      "the replica of an empty source is an empty table")
    // the mark landed: the first data then flows incrementally
    Snapshots.append(Seq((1L, "x"), (2L, "y")).toDF("id", "s"), src)
    val r2 = Snapshots.replicate(spark, src, dst, Seq("id"))
    assert(r2.fromVersion == r.toVersion)
    assert(Snapshots.read(spark, dst).count() == 2)
  }

  test("replicate carries the source's layout declarations at first " +
      "sync: later applies cluster and prune on the replica too") {
    val src = tmp(); val dst = tmp()
    Snapshots.createTable(spark,
      src, Seq((1L, 1.0)).toDF("id", "v").schema,
      properties = Map("cluster.columns" -> "id"))
    Snapshots.append((1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"),
      src)
    Snapshots.replicate(spark, src, dst, Seq("id"))
    val props = Snapshots.tableProperties(spark, dst)
    assert(props.get("cluster.columns").contains("id"),
      s"replica must carry the source's clustering: $props")
  }

  test("replicate refuses to merge lineages and vacuumed gaps") {
    val src = tmp(); val dst = tmp()
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), src)
    Snapshots.append(Seq((9L, "z")).toDF("id", "s"), dst) // foreign content
    val e1 = intercept[IllegalStateException](
      Snapshots.replicate(spark, src, dst, Seq("id")))
    assert(e1.getMessage.contains("two"))
    // a replica is a recorded CONSUMER of the source: after one
    // replicate, a vacuum that would drop the applied version REFUSES
    // (the streaming-floor discipline), so routine retention cannot
    // strand the replica
    val dst2 = tmp()
    Snapshots.replicate(spark, src, dst2, Seq("id"))
    (1 to 12).foreach(i =>
      Snapshots.append(Seq((100L + i, "x")).toDF("id", "s"), src))
    Snapshots.compact(spark, src, 1)
    val eFloor = intercept[IllegalStateException](
      Snapshots.vacuum(spark, src, keepVersions = 1))
    assert(eFloor.getMessage.contains("replica-"),
      "the refusal must name the replica's floor")
    // clipToConsumers keeps the resume point instead — the replica
    // still replicates after the clipped sweep
    Snapshots.vacuum(spark, src, keepVersions = 1, clipToConsumers = true)
    Snapshots.replicate(spark, src, dst2, Seq("id"))
    assert(Snapshots.read(spark, dst2).count() ==
      Snapshots.read(spark, src).count())
    // FORCED past the mark anyway: the gap refusal fires, and the
    // remedy (fresh target) is the documented one
    (1 to 3).foreach(i =>
      Snapshots.append(Seq((200L + i, "y")).toDF("id", "s"), src))
    Snapshots.compact(spark, src, 1)
    Snapshots.vacuum(spark, src, keepVersions = 1, force = true)
    val e2 = intercept[IllegalArgumentException](
      Snapshots.replicate(spark, src, dst2, Seq("id")))
    assert(e2.getMessage.contains("not retained"))
  }

  test("CALL replicate: the SQL surface") {
    val w = Files.createTempDirectory("graft_ac_wh").toFile.toString
    spark.conf.set("spark.sql.catalog.gar", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gar.warehouse", w)
    spark.sql("CREATE TABLE gar.default.s (id BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO gar.default.s VALUES (1, 1.0), (2, 2.0)")
    val row = spark.sql(
      "CALL gar.system.replicate(source => 'default.s', " +
        "target => 'default.d', keys => 'id')").collect().head
    assert(row.getAs[Number]("to_version").intValue > 0)
    spark.sql("INSERT INTO gar.default.s VALUES (3, 3.0)")
    spark.sql("DELETE FROM gar.default.s WHERE id = 1")
    spark.sql(
      "CALL gar.system.replicate(source => 'default.s', " +
        "target => 'default.d', keys => 'id')")
    assert(spark.sql("SELECT id, v FROM gar.default.d ORDER BY id")
      .as[(Long, Double)].collect().toSeq == Seq((2L, 2.0), (3L, 3.0)))
  }
}
