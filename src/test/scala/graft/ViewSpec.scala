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
    // streaming from a view: a named refusal, not an unresolved puzzle
    // (the analyzer may surface the rule's throw wrapped)
    val e = intercept[Exception](
      spark.readStream.table("gvw.default.av").schema)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cannot STREAM from view")), msgs(e))
    spark.sql("DROP VIEW gvw.default.av")
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
