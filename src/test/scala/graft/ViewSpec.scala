package graft

import java.nio.file.Files

import graft.ops.Snapshots

/** Persistent catalog views: CREATE/SELECT/SHOW/DROP round-trips, the
  * CREATE-time resolution context, replace semantics, temp-view
  * refusal, nesting, and cross-session durability. */
class ViewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_vw_wh").toFile.toString
    spark.conf.set("spark.sql.catalog.gvw", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvw.warehouse", w)
    spark.sql("CREATE TABLE gvw.default.t (id BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO gvw.default.t VALUES (1, 1.0), (2, 2.0), " +
      "(3, 3.0), (4, 4.0)")
    w
  }

  test("CREATE VIEW persists; SELECT reads through it; SHOW VIEWS " +
      "lists it; DROP VIEW removes it") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.big AS " +
      "SELECT id, v * 10 AS v10 FROM gvw.default.t WHERE id > 2")
    assert(spark.sql("SELECT id, v10 FROM gvw.default.big ORDER BY id")
      .as[(Long, Double)].collect().toSeq == Seq((3L, 30.0), (4L, 40.0)))
    // the view is BINDING to the live table: new rows show up
    spark.sql("INSERT INTO gvw.default.t VALUES (9, 9.0)")
    assert(spark.sql("SELECT count(*) FROM gvw.default.big")
      .head().getLong(0) == 3L)
    val shown = spark.sql("SHOW VIEWS IN gvw.default").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(shown.contains(("default", "big", false)), shown.toSeq)
    spark.sql("DROP VIEW gvw.default.big")
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM gvw.default.big").collect())
    // IF EXISTS on the now-missing view is quiet; without it, loud
    spark.sql("DROP VIEW IF EXISTS gvw.default.big")
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("DROP VIEW gvw.default.big"))
  }

  test("unqualified references resolve against the CREATE-time " +
      "catalog/namespace, not the reader's context") {
    warehouse
    spark.sql("USE gvw")
    try spark.sql("CREATE VIEW default.ctx AS " +
      "SELECT sum(v) AS sv FROM default.t WHERE id <= 2")
    finally spark.sql("USE spark_catalog")
    // read from a DIFFERENT current catalog: the stored context wins
    assert(spark.sql("SELECT sv FROM gvw.default.ctx")
      .head().getDouble(0) == 3.0)
  }

  test("CREATE OR REPLACE swaps the definition; IF NOT EXISTS is a " +
      "no-op on an existing view; plain CREATE refuses") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.r AS SELECT id FROM gvw.default.t")
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("CREATE VIEW gvw.default.r AS SELECT v FROM gvw.default.t"))
    spark.sql("CREATE VIEW IF NOT EXISTS gvw.default.r AS " +
      "SELECT v FROM gvw.default.t") // kept: the original definition
    assert(spark.sql("SELECT * FROM gvw.default.r").columns.toSeq ==
      Seq("id"))
    spark.sql("CREATE OR REPLACE VIEW gvw.default.r AS " +
      "SELECT v AS val FROM gvw.default.t")
    assert(spark.sql("SELECT * FROM gvw.default.r").columns.toSeq ==
      Seq("val"))
    spark.sql("DROP VIEW gvw.default.r")
  }

  test("a view cannot reference a TEMP view, shadow a table, or be " +
      "read as a table by the table surface") {
    warehouse
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("vw_tmp_src")
    val e = intercept[IllegalArgumentException](
      spark.sql("CREATE VIEW gvw.default.overtmp AS " +
        "SELECT * FROM vw_tmp_src"))
    assert(e.getMessage.toLowerCase.contains("temp view"))
    // a view name colliding with a TABLE refuses
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("CREATE VIEW gvw.default.t AS SELECT 1 AS one"))
    // and INSERT into a view has no table to write to
    spark.sql("CREATE VIEW gvw.default.ro AS SELECT id FROM gvw.default.t")
    intercept[Exception](
      spark.sql("INSERT INTO gvw.default.ro VALUES (99)"))
    spark.sql("DROP VIEW gvw.default.ro")
  }

  test("views nest, carry column aliases, and expand CTE bodies") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.base (key, tenfold) AS " +
      "WITH w AS (SELECT id, v * 10 AS t10 FROM gvw.default.t) " +
      "SELECT id, t10 FROM w")
    spark.sql("CREATE VIEW gvw.default.top AS " +
      "SELECT sum(tenfold) AS s FROM gvw.default.base WHERE key <= 2")
    assert(spark.sql("SELECT s FROM gvw.default.top").head().getDouble(0)
      == 30.0)
    spark.sql("DROP VIEW gvw.default.top")
    spark.sql("DROP VIEW gvw.default.base")
  }

  test("views persist across sessions (the point, vs temp views)") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.durable AS " +
      "SELECT count(*) AS n FROM gvw.default.t")
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.catalog.gvw", "graft.sql.GraftCatalog")
    fresh.conf.set("spark.sql.catalog.gvw.warehouse", warehouse)
    assert(fresh.sql("SELECT n FROM gvw.default.durable")
      .head().getLong(0) >= 4L)
    spark.sql("DROP VIEW gvw.default.durable")
  }

  test("a name explicitly prefixed with ANOTHER catalog is never " +
      "hijacked into the graft warehouse") {
    warehouse
    spark.sql("USE gvw")
    try {
      // view DDL aimed at the SESSION catalog routes to Spark's own
      // path even while a graft catalog is current
      spark.sql("CREATE VIEW spark_catalog.default.sc_v AS SELECT 1 AS one")
      assert(spark.sql("SELECT one FROM spark_catalog.default.sc_v")
        .head().getInt(0) == 1)
      // and it did NOT land under the graft warehouse
      val cat = spark.sessionState.catalogManager.catalog("gvw")
        .asInstanceOf[graft.sql.GraftCatalog]
      import org.apache.spark.sql.connector.catalog.Identifier
      assert(!cat.viewExists(
        Identifier.of(Array("spark_catalog", "default"), "sc_v")))
      spark.sql("DROP VIEW spark_catalog.default.sc_v")
    } finally spark.sql("USE spark_catalog")
  }

  test("a reader-local TEMP view cannot hijack a stored view's tables") {
    warehouse
    spark.sql("USE gvw")
    try spark.sql("CREATE VIEW default.nohijack AS " +
      "SELECT count(*) AS n FROM t") // bare name: CREATE-time = gvw.default.t
    finally spark.sql("USE spark_catalog")
    val catalogCount = spark.sql("SELECT n FROM gvw.default.nohijack")
      .head().getLong(0)
    assert(catalogCount >= 4L)
    // the reader now shadows the name with a session-local temp view —
    // the stored definition must keep reading the CATALOG table
    Seq((1, 1)).toDF("a", "b").createOrReplaceTempView("t")
    try {
      assert(spark.sql("SELECT n FROM gvw.default.nohijack")
        .head().getLong(0) == catalogCount,
        "a reader-local temp view hijacked the stored definition")
    } finally spark.catalog.dropTempView("t")
    spark.sql("DROP VIEW gvw.default.nohijack")
  }

  test("ALTER VIEW ... AS swaps the definition, keeps properties, " +
      "refuses temp references; streaming a view refuses by name") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.av AS SELECT id FROM gvw.default.t")
    val cat = spark.sessionState.catalogManager.catalog("gvw")
      .asInstanceOf[graft.sql.GraftCatalog]
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange}
    cat.alterView(Identifier.of(Array("default"), "av"),
      ViewChange.setProperty("owner.team", "data"))
    spark.sql("ALTER VIEW gvw.default.av AS " +
      "SELECT v AS val FROM gvw.default.t WHERE id <= 2")
    assert(spark.sql("SELECT sum(val) FROM gvw.default.av")
      .head().getDouble(0) == 3.0)
    assert(cat.loadView(Identifier.of(Array("default"), "av"))
      .properties.get("owner.team") == "data",
      "ALTER VIEW AS must keep the view's properties")
    Seq((9, 9)).toDF("a", "b").createOrReplaceTempView("av_tmp")
    try intercept[IllegalArgumentException](
      spark.sql("ALTER VIEW gvw.default.av AS SELECT * FROM av_tmp"))
    finally spark.catalog.dropTempView("av_tmp")
    // ALTER VIEW AS on a missing view surfaces the standard error
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("ALTER VIEW gvw.default.missing_v AS SELECT 1 AS one"))
    // a projection/filter view is STATELESS — it streams (see the
    // dedicated streaming tests); an AGGREGATE view refuses by name,
    // not as an unresolved puzzle (the analyzer may wrap the throw)
    assert(spark.readStream.table("gvw.default.av").isStreaming)
    spark.sql("CREATE VIEW gvw.default.avagg AS " +
      "SELECT sum(v) AS sv FROM gvw.default.t")
    val e = intercept[Exception](
      spark.readStream.table("gvw.default.avagg").schema)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cannot STREAM from view")), msgs(e))
    spark.sql("DROP VIEW gvw.default.avagg")
    spark.sql("DROP VIEW gvw.default.av")
  }

  test("REPLACE/ALTER publish GENERATIONS through the CAS: the prior " +
      "definition survives the publish instant; superseded ones prune") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.gen AS SELECT id FROM gvw.default.t")
    val dir = new java.io.File(
      new java.net.URI(new org.apache.hadoop.fs.Path(
        s"$warehouse/default/gen").toUri.toString).getPath)
    def gens: Seq[String] = dir.listFiles().map(_.getName)
      .filter(_.startsWith("_view")).sorted.toSeq
    assert(gens == Seq("_view.1"))
    spark.sql("CREATE OR REPLACE VIEW gvw.default.gen AS " +
      "SELECT v FROM gvw.default.t")
    // generation 1 is pruned only once generation 2 is durable — a
    // crash between the two leaves the OLD definition readable, never
    // a view-less window
    assert(gens == Seq("_view.1", "_view.2"), gens)
    spark.sql("CREATE OR REPLACE VIEW gvw.default.gen AS " +
      "SELECT id, v FROM gvw.default.t")
    assert(gens == Seq("_view.2", "_view.3"), gens)
    assert(spark.sql("SELECT * FROM gvw.default.gen").columns.toSeq ==
      Seq("id", "v"))
    spark.sql("DROP VIEW gvw.default.gen")
  }

  test("a legacy single _view document reads as generation 0 and " +
      "replaces through the generation CAS") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.leg AS SELECT id FROM gvw.default.t")
    val d = new java.io.File(new org.apache.hadoop.fs.Path(
      s"$warehouse/default/leg").toUri.getPath)
    // rewrite the layout a pre-generation build left behind
    assert(new java.io.File(d, "_view.1").renameTo(
      new java.io.File(d, "_view")))
    assert(spark.sql("SELECT * FROM gvw.default.leg").columns.toSeq ==
      Seq("id"))
    spark.sql("CREATE OR REPLACE VIEW gvw.default.leg AS " +
      "SELECT v AS vv FROM gvw.default.t")
    assert(spark.sql("SELECT * FROM gvw.default.leg").columns.toSeq ==
      Seq("vv"))
    spark.sql("CREATE OR REPLACE VIEW gvw.default.leg AS " +
      "SELECT id AS k FROM gvw.default.t")
    // the second replace prunes the legacy generation-0 document
    assert(!new java.io.File(d, "_view").exists())
    assert(spark.sql("SELECT * FROM gvw.default.leg").columns.toSeq ==
      Seq("k"))
    spark.sql("DROP VIEW gvw.default.leg")
  }

  test("concurrent ALTER VIEW property writers never silently lose an " +
      "update: the CAS on the loaded generation forces loud retries") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.cc AS SELECT id FROM gvw.default.t")
    val cat = spark.sessionState.catalogManager.catalog("gvw")
      .asInstanceOf[graft.sql.GraftCatalog]
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange}
    val id = Identifier.of(Array("default"), "cc")
    val writers = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.CountDownLatch(writers)
    (1 to writers).foreach { w =>
      pool.execute { () =>
        try {
          var landed = false
          var tries = 0
          while (!landed && tries < 100) {
            tries += 1
            try {
              cat.alterView(id, ViewChange.setProperty(s"k$w", s"v$w"))
              landed = true
            } catch {
              case _: java.util.ConcurrentModificationException => // retry
            }
          }
          if (!landed) errs.add(new IllegalStateException(s"writer $w starved"))
        } catch { case t: Throwable => errs.add(t) }
        finally done.countDown()
      }
    }
    assert(done.await(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdownNow()
    assert(errs.isEmpty, s"alter failed: ${Option(errs.peek())}")
    val props = cat.loadView(id).properties
    (1 to writers).foreach { w =>
      assert(props.get(s"k$w") == s"v$w",
        s"writer $w's property was silently lost (have: $props)")
    }
    spark.sql("DROP VIEW gvw.default.cc")
  }

  test("SHOW CREATE VIEW parity: the rendered statement carries " +
      "aliases, comments and properties; tables keep Spark's own path") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.scv (key COMMENT 'the id', tenx) " +
      "COMMENT 'doc comment' TBLPROPERTIES ('team' = 'data') AS " +
      "SELECT id, v * 10 FROM gvw.default.t")
    val row = spark.sql("SHOW CREATE TABLE gvw.default.scv").head()
    val stmt = row.getString(0)
    assert(stmt.contains("CREATE VIEW gvw.default.scv"), stmt)
    assert(stmt.contains("`key` COMMENT 'the id'"), stmt)
    assert(stmt.contains("`tenx`"), stmt)
    assert(stmt.contains("COMMENT 'doc comment'"), stmt)
    assert(stmt.contains("'team' = 'data'"), stmt)
    assert(stmt.contains("AS SELECT id, v * 10"), stmt)
    // a TABLE identifier still answers through Spark's v2 exec
    val tbl = spark.sql("SHOW CREATE TABLE gvw.default.t")
      .head().getString(0)
    assert(tbl.contains("CREATE TABLE"), tbl)
    // the rendered statement is RE-RUNNABLE: drop, execute it
    // verbatim, and the recreated view answers identically
    val before = spark.sql("SELECT sum(tenx) FROM gvw.default.scv")
      .head().getDouble(0)
    spark.sql("DROP VIEW gvw.default.scv")
    spark.sql(stmt)
    assert(spark.sql("SELECT sum(tenx) FROM gvw.default.scv")
      .head().getDouble(0) == before,
      "SHOW CREATE VIEW output must recreate an equivalent view")
    assert(spark.sql("SHOW CREATE TABLE gvw.default.scv")
      .head().getString(0).contains("COMMENT 'the id'"))
    spark.sql("DROP VIEW gvw.default.scv")
  }

  test("DESCRIBE [EXTENDED] and SHOW TBLPROPERTIES answer on views " +
      "(aliases, comments, definition context, properties)") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.dsc (key COMMENT 'the id', tenx) " +
      "COMMENT 'doc' TBLPROPERTIES ('team' = 'data') AS " +
      "SELECT id, v * 10 FROM gvw.default.t")
    val desc = spark.sql("DESCRIBE gvw.default.dsc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(desc.toSeq == Seq(("key", "bigint", "the id"),
      ("tenx", "double", null)), desc.toSeq)
    val ext = spark.sql("DESCRIBE EXTENDED gvw.default.dsc").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(ext.contains(("Type", "VIEW")), ext.toSeq)
    assert(ext.contains(("Comment", "doc")), ext.toSeq)
    assert(ext.exists { case (k, v) =>
      k == "View Text" && v.contains("SELECT id, v * 10") }, ext.toSeq)
    assert(ext.exists { case (k, v) =>
      k == "View Catalog and Namespace" && v.contains("default") },
      ext.toSeq)
    assert(ext.exists { case (k, v) =>
      k == "View Properties" && v.contains("team=data") }, ext.toSeq)
    val props = spark.sql("SHOW TBLPROPERTIES gvw.default.dsc").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("team").contains("data"), props)
    val one = spark.sql("SHOW TBLPROPERTIES gvw.default.dsc ('team')")
      .head()
    assert(one.getString(one.size - 1) == "data", one)
    val missing = spark.sql(
      "SHOW TBLPROPERTIES gvw.default.dsc ('nope')").head()
    assert(missing.getString(missing.size - 1)
      .contains("does not have property"), missing)
    // a TABLE identifier still answers through Spark's own paths
    assert(spark.sql("DESCRIBE gvw.default.t").collect().nonEmpty)
    spark.sql("DROP VIEW gvw.default.dsc")
  }

  test("a REPLACE or ALTER that closes a view reference cycle refuses " +
      "at DDL time, naming the cycle") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.cyc_a AS " +
      "SELECT id FROM gvw.default.t")
    spark.sql("CREATE VIEW gvw.default.cyc_b AS " +
      "SELECT id FROM gvw.default.cyc_a")
    val e = intercept[IllegalArgumentException](
      spark.sql("ALTER VIEW gvw.default.cyc_a AS " +
        "SELECT id FROM gvw.default.cyc_b"))
    assert(e.getMessage.contains("cycle") &&
      e.getMessage.contains("cyc_b"), e.getMessage)
    // direct self-reference through CREATE OR REPLACE
    val e2 = intercept[IllegalArgumentException](
      spark.sql("CREATE OR REPLACE VIEW gvw.default.cyc_a AS " +
        "SELECT id FROM gvw.default.cyc_a"))
    assert(e2.getMessage.contains("cycle"), e2.getMessage)
    // a NON-cycling ALTER still lands (cyc_b -> cyc_a stays a DAG)
    spark.sql("ALTER VIEW gvw.default.cyc_b AS " +
      "SELECT id, 1 AS one FROM gvw.default.cyc_a")
    assert(spark.sql("SELECT * FROM gvw.default.cyc_b").columns.toSeq ==
      Seq("id", "one"))
    spark.sql("DROP VIEW gvw.default.cyc_b")
    spark.sql("DROP VIEW gvw.default.cyc_a")
  }

  test("streaming a PASS-THROUGH view resolves to the underlying " +
      "table's stream (aliases applied); nested pass-through chases") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.pt AS SELECT * FROM gvw.default.t")
    spark.sql("CREATE VIEW gvw.default.pt2 (a, b) AS " +
      "SELECT * FROM gvw.default.pt")
    val s1 = spark.readStream.table("gvw.default.pt")
    assert(s1.isStreaming && s1.columns.toSeq == Seq("id", "v"))
    val s2 = spark.readStream.table("gvw.default.pt2")
    assert(s2.isStreaming && s2.columns.toSeq == Seq("a", "b"))
    // the stream actually DELIVERS the table's rows through the view
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val ckpt = Files.createTempDirectory("graft_vw_pt").toFile.toString
    val q = s2.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("a").as[Long].collect() }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable(); q.stop()
    assert(got.synchronized(got.nonEmpty) &&
      got.synchronized(got.toSet).subsetOf(Set(1L, 2L, 3L, 4L, 9L)),
      got.toSeq)
    spark.sql("DROP VIEW gvw.default.pt2")
    spark.sql("DROP VIEW gvw.default.pt")
  }

  test("streaming a STATELESS-TRANSFORM view composes its projection " +
      "and filter over the table's stream; aggregates, joins and " +
      "non-deterministic definitions still refuse") {
    warehouse
    // filter + computed projection: legal — each change-feed row maps
    // through the view's transform independently
    spark.sql("CREATE VIEW gvw.default.sv AS " +
      "SELECT id, v * 10 AS v10 FROM gvw.default.t WHERE id >= 2")
    val s = spark.readStream.table("gvw.default.sv")
    assert(s.isStreaming && s.columns.toSeq == Seq("id", "v10"))
    val got = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val ckpt = Files.createTempDirectory("graft_vw_sv").toFile.toString
    val q = s.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.as[(Long, Double)].collect()
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    // rows appended WHILE the stream runs flow through the transform
    spark.sql("INSERT INTO gvw.default.t VALUES (7, 7.0), (1, 1.5)")
    q.processAllAvailable(); q.stop()
    val seen = got.synchronized(got.toSet)
    // the suite's shared table accretes rows across tests — the model
    // is the BATCH view evaluated now: same transform, same rows
    val expected = spark.sql(
      "SELECT id, v * 10 FROM gvw.default.t WHERE id >= 2")
      .as[(Long, Double)].collect().toSet
    assert(seen == expected,
      s"the stream must equal the batch view: $seen vs $expected")
    assert(seen.contains((7L, 70.0)) && !seen.exists(_._1 < 2L),
      s"mid-stream append must flow through the transform: $seen")
    // a NESTED stateless chain composes too (filter over filter)
    spark.sql("CREATE VIEW gvw.default.sv2 AS " +
      "SELECT id FROM gvw.default.sv WHERE v10 > 25")
    assert(spark.readStream.table("gvw.default.sv2").isStreaming)
    def refused(name: String, sql: String): Unit = {
      spark.sql(s"CREATE VIEW gvw.default.$name AS $sql")
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      val e = intercept[Exception](
        spark.readStream.table(s"gvw.default.$name").schema)
      assert(msgs(e).exists(_.contains("cannot STREAM from view")),
        s"$name: ${msgs(e)}")
      spark.sql(s"DROP VIEW gvw.default.$name")
    }
    refused("r_agg", "SELECT id, sum(v) AS s FROM gvw.default.t GROUP BY id")
    refused("r_join", "SELECT a.id FROM gvw.default.t a " +
      "JOIN gvw.default.t b ON a.id = b.id")
    refused("r_rand", "SELECT id, rand() AS r FROM gvw.default.t")
    refused("r_limit", "SELECT id FROM gvw.default.t LIMIT 2")
    refused("r_dist", "SELECT DISTINCT id FROM gvw.default.t")
    refused("r_win", "SELECT id, row_number() OVER (ORDER BY id) AS rn " +
      "FROM gvw.default.t")
    refused("r_sub", "SELECT id FROM gvw.default.t " +
      "WHERE id IN (SELECT id FROM gvw.default.t WHERE v > 2)")
    // a stateless view OVER a refusing view refuses too (the chain is
    // only as streamable as its weakest link)
    spark.sql("CREATE VIEW gvw.default.r_base AS " +
      "SELECT id, count(*) AS n FROM gvw.default.t GROUP BY id")
    refused("r_chain", "SELECT id FROM gvw.default.r_base WHERE id > 0")
    spark.sql("DROP VIEW gvw.default.r_base")
    spark.sql("DROP VIEW gvw.default.sv2")
    spark.sql("DROP VIEW gvw.default.sv")
  }

  test("reader options travel through a streamed view to the base " +
      "source; readChangeFeed works pass-through and refuses when a " +
      "transform would drop the feed's metadata") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.cfv AS SELECT * FROM gvw.default.t")
    val events = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val ckpt = Files.createTempDirectory("graft_vw_cf").toFile.toString
    val q = spark.readStream.option("readChangeFeed", "true")
      .table("gvw.default.cfv")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        events.synchronized {
          events ++= df.select("_change_type", "id")
            .as[(String, Long)].collect()
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    // DML lands in the feed THROUGH the view — the reader's option
    // reached the base source (the plain stream would kill the query)
    spark.sql("INSERT INTO gvw.default.t VALUES (501, 5.0)")
    spark.sql("DELETE FROM gvw.default.t WHERE id = 501")
    q.processAllAvailable(); q.stop()
    val got = events.synchronized(events.toList)
    assert(got.count(_ == ("insert", 501L)) == 1, got)
    assert(got.count(_ == ("delete", 501L)) == 1, got)
    // a filtered/projected view cannot deliver a change feed: the
    // transform would drop _change_type or ambiguously filter pre-
    // vs post-images — refuse by name
    spark.sql("CREATE VIEW gvw.default.cfv_f AS " +
      "SELECT id FROM gvw.default.t WHERE id > 1")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](
      spark.readStream.option("readChangeFeed", "true")
        .table("gvw.default.cfv_f").schema)
    assert(msgs(e).exists(_.contains("cannot STREAM from view")), msgs(e))
    // ...while the SAME view streams fine without the feed option
    assert(spark.readStream.table("gvw.default.cfv_f").isStreaming)
    // declared column aliases cannot cover the feed's metadata
    // columns — the named refusal, not an arity puzzle
    spark.sql("CREATE VIEW gvw.default.cfv_a (x, y) AS " +
      "SELECT * FROM gvw.default.t")
    val e2 = intercept[Exception](
      spark.readStream.option("readChangeFeed", "true")
        .table("gvw.default.cfv_a").schema)
    assert(msgs(e2).exists(_.contains("cannot STREAM from view")), msgs(e2))
    assert(spark.readStream.table("gvw.default.cfv_a").isStreaming)
    spark.sql("DROP VIEW gvw.default.cfv_a")
    spark.sql("DROP VIEW gvw.default.cfv_f")
    spark.sql("DROP VIEW gvw.default.cfv")
  }

  test("a name is a table XOR a view: creation paths refuse, and the " +
      "staged-commit re-check rolls the table back after a raced " +
      "CREATE VIEW") {
    warehouse
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = spark.sessionState.catalogManager.catalog("gvw")
      .asInstanceOf[graft.sql.GraftCatalog]
    // sequential refusals, both directions
    spark.sql("CREATE VIEW gvw.default.xv AS SELECT 1 AS one")
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("CREATE TABLE gvw.default.xv (id BIGINT) USING graft"))
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("CREATE TABLE gvw.default.xv USING graft AS " +
        "SELECT 1 AS one"))
    spark.sql("DROP VIEW gvw.default.xv")
    // the RACE, deterministically interleaved: an atomic CTAS stages,
    // a CREATE VIEW of the same name lands between the stage and the
    // commit (the view's pre-check sees no table yet — no manifest
    // exists) — the table commit's re-check must roll the table back
    // and fail loudly, leaving the name a view only
    import org.apache.spark.sql.connector.catalog.{Column => CCol, TableInfo, ViewInfo}
    import org.apache.spark.sql.types.{LongType, StructType, StructField}
    val ident = Identifier.of(Array("default"), "racy")
    val staged = cat.stageCreate(ident, new TableInfo.Builder()
      .withColumns(Array(CCol.create("id", LongType)))
      .withProperties(java.util.Collections.emptyMap[String, String]())
      .withPartitions(Array.empty)
      .build())
    cat.createView(new ViewInfo(ident, "SELECT 1 AS one",
      "gvw", Array("default"),
      StructType(Seq(StructField("one", LongType))),
      Array("one"), Array.empty[String], Array.empty[String],
      java.util.Collections.emptyMap[String, String]()))
    intercept[org.apache.spark.sql.catalyst.analysis
      .ViewAlreadyExistsException](staged.commitStagedChanges())
    assert(cat.viewExists(ident), "the raced view must survive")
    assert(!cat.tableExists(ident),
      "the losing table commit must roll itself back")
    assert(spark.sql("SELECT one FROM gvw.default.racy")
      .head().getInt(0) == 1)
    cat.dropView(ident)
  }

  test("programmatic ViewCatalog surface: rename and property alter") {
    warehouse
    spark.sql("CREATE VIEW gvw.default.pv AS SELECT id FROM gvw.default.t")
    val cat = spark.sessionState.catalogManager.catalog("gvw")
      .asInstanceOf[graft.sql.GraftCatalog]
    val ns = Array("default")
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange}
    cat.renameView(Identifier.of(ns, "pv"), Identifier.of(ns, "pv2"))
    assert(spark.sql("SELECT count(*) FROM gvw.default.pv2")
      .head().getLong(0) >= 4L)
    cat.alterView(Identifier.of(ns, "pv2"),
      ViewChange.setProperty("owner.team", "data"))
    assert(cat.loadView(Identifier.of(ns, "pv2"))
      .properties.get("owner.team") == "data")
    // dropTable must NOT remove a view (distinct namespaces)
    assert(!cat.dropTable(Identifier.of(ns, "pv2")))
    assert(cat.dropView(Identifier.of(ns, "pv2")))
  }
}
