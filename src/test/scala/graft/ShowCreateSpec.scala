package graft

import java.nio.file.Files

/** SHOW CREATE TABLE over the catalog — Spark's v2 exec regenerates
  * DDL from the connector table's schema/properties. */
class ShowCreateSpec extends SparkSpec {
  test("SHOW CREATE TABLE regenerates the v2 DDL") {
    val w = Files.createTempDirectory("graft_sct").toFile.toString
    spark.conf.set("spark.sql.catalog.gsc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsc.warehouse", w)
    spark.sql("""CREATE TABLE gsc.default.sct (
      id BIGINT, v DOUBLE DEFAULT 1.5, s STRING)
      USING graft TBLPROPERTIES ('cluster.columns' = 'id')""")
    spark.sql("INSERT INTO gsc.default.sct VALUES (1, 2.0, 'x')")
    val ddl = spark.sql("SHOW CREATE TABLE gsc.default.sct")
      .collect().head.getString(0)
    println("DDL>>> " + ddl)
    assert(ddl.contains("id BIGINT") && ddl.contains("s STRING"))
    assert(ddl.toLowerCase.contains("cluster.columns"))
  }
}
