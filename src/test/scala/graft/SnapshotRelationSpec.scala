package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Batch DataFrame-API surface of snapshot tables:
  * `df.write.format("graft-snapshots")` commits through the manifest
  * protocol (SaveMode → append/overwrite/first-commit semantics) and
  * `spark.read.format("graft-snapshots")` reads any version with
  * pushed filters routed through manifest-stats file pruning. */
class SnapshotRelationSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_rel").toFile.toString + "/t"

  test("writer SaveModes map onto the commit protocol") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Append).save(root)
    Seq((2L, "b")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Append).save(root)
    assert(Snapshots.versions(spark, root) == Seq(1, 2))
    assert(Snapshots.read(spark, root).count() == 2)
    // Overwrite replaces content, history stays readable
    Seq((9L, "z")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Overwrite).save(root)
    assert(Snapshots.read(spark, root).as[(Long, String)]
      .collect().toSeq == Seq((9L, "z")))
    assert(Snapshots.read(spark, root, 2).count() == 2)
    // ErrorIfExists refuses an existing table; Ignore is a no-op
    intercept[IllegalStateException] {
      Seq((3L, "c")).toDF("k", "v").write.format("graft-snapshots")
        .mode(SaveMode.ErrorIfExists).save(root)
    }
    Seq((3L, "c")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Ignore).save(root)
    assert(Snapshots.read(spark, root).count() == 1)
    // ErrorIfExists creates a fresh table
    val root2 = freshRoot()
    Seq((4L, "d")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.ErrorIfExists).save(root2)
    assert(Snapshots.read(spark, root2).count() == 1)
  }

  test("reader: latest, versionAsOf, filters and SQL over a temp view") {
    val root = freshRoot()
    Seq(0L until 100L, 100L until 200L, 200L until 300L).foreach { r =>
      r.toDF("id").withColumn("tag", concat(lit("t"), $"id" % 7))
        .repartition(1).write.format("graft-snapshots")
        .mode(SaveMode.Append).save(root)
    }
    val df = spark.read.format("graft-snapshots").option("path", root).load()
    assert(df.count() == 300)
    assert(df.filter($"id" >= 120L && $"id" < 180L).count() == 60)
    assert(df.filter($"id" >= 120L && $"id" < 180L)
      .select("id").as[Long].collect().sorted.toSeq == (120L until 180L))
    // time travel through the reader option
    val v1 = spark.read.format("graft-snapshots").option("path", root)
      .option("versionAsOf", 1).load()
    assert(v1.count() == 100)
    // SQL interop: a temp view over the relation
    df.createOrReplaceTempView("snap_rel_t")
    val n = spark.sql(
      "SELECT count(*) AS n FROM snap_rel_t WHERE id < 50 AND tag = 't3'")
      .as[Long].head()
    assert(n == (0L until 50L).count(_ % 7 == 3))
    // projection-only scans work (no filter, pruned columns)
    assert(df.select("tag").distinct().count() == 7)
  }

  test("batch readChangeFeed replays a version range as change rows") {
    val root = freshRoot()
    Snapshots.append((0L until 10L).map(i => (i, i * 1.0))
      .toDF("id", "v").coalesce(1), root) // v1
    Snapshots.append((10L until 20L).map(i => (i, i * 1.0))
      .toDF("id", "v").coalesce(1), root) // v2
    Snapshots.merge(spark, root,
      Seq((5L, 500.0), (20L, 20.0)).toDF("id", "v"), Seq("id")) // v3
    Snapshots.deleteMatching(spark, root,
      Seq(Tuple1(1L)).toDF("id"), Seq("id")) // v4
    def feed(from: Int, to: Int = -1) = {
      val r = spark.read.format("graft-snapshots").option("path", root)
        .option("readChangeFeed", "true").option("startingVersion", from)
      (if (to >= 0) r.option("endingVersion", to) else r).load()
        .select("_change_type", "_commit_version", "id", "v")
        .as[(String, Int, Long, Double)].collect().toSet
    }
    // startingVersion is INCLUSIVE; v3 upsert PAIRS its matched key
    // into update images and keeps the fresh key an insert
    assert(feed(3) == Set(
      ("update_preimage", 3, 5L, 5.0),
      ("update_postimage", 3, 5L, 500.0),
      ("insert", 3, 20L, 20.0), ("delete", 4, 1L, 1.0)))
    // endingVersion bounds the range inclusively
    assert(feed(3, 3) == Set(
      ("update_preimage", 3, 5L, 5.0),
      ("update_postimage", 3, 5L, 500.0),
      ("insert", 3, 20L, 20.0)))
    // full-history replay folds to the table's current content
    assert(feed(1).size == 10 + 10 + 3 + 1)
    // option validation is loud
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshots").option("path", root)
        .option("readChangeFeed", "true").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshots").option("path", root)
        .option("readChangeFeed", "true").option("startingVersion", 2)
        .option("versionAsOf", 3).load()
    }
  }

  test("timestamp twins: timestampAsOf pins a read, " +
      "startingTimestamp/endingTimestamp bound a change feed") {
    val root = freshRoot()
    def fmt(ms: Long) = new java.sql.Timestamp(ms).toString
    Seq((1L, "a")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Append).save(root) // v1
    Thread.sleep(60)
    val betweenV1V2 = System.currentTimeMillis()
    Thread.sleep(60)
    Seq((2L, "b")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Append).save(root) // v2
    // a read pinned between the commits sees only v1
    assert(spark.read.format("graft-snapshots").option("path", root)
      .option("timestampAsOf", fmt(betweenV1V2)).load().count() == 1)
    // the feed FROM that instant replays v2 only
    val feed = spark.read.format("graft-snapshots").option("path", root)
      .option("readChangeFeed", "true")
      .option("startingTimestamp", fmt(betweenV1V2)).load()
    assert(feed.select("k").as[Long].collect().toSeq == Seq(2L))
    // ...and bounded to BEFORE v2 by endingTimestamp refuses nothing
    // but yields the empty pre-v2 range → startingVersion must win:
    // conflicting twin options refuse loudly
    intercept[Exception] {
      spark.read.format("graft-snapshots").option("path", root)
        .option("readChangeFeed", "true").option("startingVersion", 1)
        .option("startingTimestamp", fmt(betweenV1V2)).load()
    }
    // a future startingTimestamp refuses (empty feed ≠ no commits yet)
    intercept[Exception] {
      spark.read.format("graft-snapshots").option("path", root)
        .option("readChangeFeed", "true")
        .option("startingTimestamp",
          fmt(System.currentTimeMillis() + 3600_000L)).load()
    }
    // streaming: startingTimestamp replays v2 onward, exactly-once
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-snapshots")
      .option("path", root)
      .option("startingTimestamp", fmt(betweenV1V2)).load()
      .writeStream.foreachBatch {
        (df: org.apache.spark.sql.DataFrame, _: Long) =>
          out.synchronized { out ++= df.select("k").as[Long].collect() }
          ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_tsck").toFile.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable(); q.stop()
    assert(out.synchronized(out.toSeq) == Seq(2L))
    // the wall-clock resolves in the SESSION timezone (like SQL
    // TIMESTAMP AS OF), not the JVM default: "now" written in a +9
    // zone must still resolve — JVM-default parsing would read it as
    // a future instant and refuse
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      // the between-commits instant written as a Tokyo wall-clock:
      // session-zone parsing lands between v1 and v2 (feed = v2);
      // JVM-default (UTC) parsing would shift it ~9h into the future
      // and refuse the feed outright
      val betweenTokyo = java.time.Instant.ofEpochMilli(betweenV1V2)
        .atZone(java.time.ZoneId.of("Asia/Tokyo")).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(spark.read.format("graft-snapshots").option("path", root)
        .option("readChangeFeed", "true")
        .option("startingTimestamp", betweenTokyo).load()
        .select("k").as[Long].collect().toSeq == Seq(2L))
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("reader surfaces renamed columns in the current logical shape") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Append).save(root)
    Snapshots.renameColumn(spark, root, "v", "label")
    val df = spark.read.format("graft-snapshots").option("path", root).load()
    assert(df.columns.toSeq == Seq("k", "label"))
    assert(df.filter($"label" === "a").count() == 1)
  }

  test("relations report manifest-derived sizeInBytes: a small " +
      "snapshot dimension AUTO-broadcasts into a fact join") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "dim")
      .write.format("graft-snapshots").mode(SaveMode.Append).save(root)
    val dim = spark.read.format("graft-snapshots")
      .option("path", root).load()
    // the v1 default (Long.MaxValue) would force sort-merge here;
    // the manifest knows the table is a few KB
    val bytes = Snapshots.liveBytes(spark, root)
    assert(bytes > 0L && bytes < (1L << 20), bytes.toString)
    val fact = spark.range(0, 10000).toDF("id")
      .withColumn("k", col("id") % 3 + 1)
    val joined = fact.join(dim, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(joined.count() == 10000)
    // change feed over one small commit reports feed-sized bytes too
    val feed = spark.read.format("graft-snapshots")
      .option("path", root).option("readChangeFeed", "true")
      .option("startingVersion", "1").load()
    val fj = fact.join(feed.select(col("k"), col("_change_type")), "k")
    val fplan = fj.queryExecution.executedPlan.toString
    assert(fplan.contains("BroadcastHashJoin"), fplan.take(2000))
  }

  test("feed sizeInBytes survives a vacuumed hole and an unbounded " +
      "end — it walks retained versions like the feed itself") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("k", "v").write.format("graft-snapshots")
      .mode(SaveMode.Append).save(root)
    (2 to 4).foreach { i =>
      Snapshots.overwrite(Seq((i.toLong, "x")).toDF("k", "v"), root)
    }
    Snapshots.append(Seq((9L, "z")).toDF("k", "v"), root) // v5
    Snapshots.vacuum(spark, root, keepVersions = 2)
    // the hole must be REAL or the survival assertions are vacuous
    assert(Snapshots.versions(spark, root) == Seq(4, 5))
    // unbounded feed from the oldest legal base (v4 retained):
    // planning the relation (stats included) must not touch
    // vacuumed manifests
    val feed = spark.read.format("graft-snapshots")
      .option("path", root).option("readChangeFeed", "true")
      .option("startingVersion", "5").load()
    assert(feed.count() >= 1)
    val bytes = Snapshots.feedBytes(spark, root, 4, -1)
    assert(bytes > 0L, bytes.toString)
    // a range whose base and interior were vacuumed still ESTIMATES
    // (walks retained versions) instead of throwing at planning
    assert(Snapshots.feedBytes(spark, root, 0, 5) > 0L)
  }
}
