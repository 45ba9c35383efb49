package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Per-statement wall-time decomposition of `s41_sql_dml_subquery` —
  * the bench's most expensive query and the one that absorbs a new
  * DML spelling most rounds. One row per statement so the NEXT
  * regression is attributable to its statement instead of the
  * query total. Statements are verbatim from SinkQueries s41.
  *
  * Usage: runMain graft.tools.S41Probe <sfDir> [rounds]
  */
object S41Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: S41Probe <sfDir> [rounds]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_s41probe_" +
      ProcessHandle.current().pid()
    spark.conf.set("spark.sql.catalog.gsq", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsq.warehouse", wh)
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView("s41_base")
    spark.sql("""SELECT o_orderkey, o_custkey, o_totalprice
      FROM s41_base WHERE o_orderkey % 53 = 1
      UNION ALL
      SELECT o_orderkey + 20000000, o_custkey, o_totalprice
      FROM s41_base WHERE o_orderkey % 53 = 2""")
      .createOrReplaceTempView("s41_src")

    val stmts: Seq[(String, String)] = Seq(
      "ctas" ->
        "CREATE TABLE gsq.default.s41 AS SELECT * FROM s41_base",
      "delete_in_subquery" ->
        """DELETE FROM gsq.default.s41 WHERE o_orderkey IN (
          SELECT o_orderkey FROM s41_base WHERE o_custkey % 9 = 4)""",
      "merge_conditional" ->
        """MERGE INTO gsq.default.s41 t USING s41_src s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND s.o_totalprice > 300000.0 THEN DELETE
          WHEN MATCHED THEN
            UPDATE SET o_totalprice = t.o_totalprice + s.o_totalprice
          WHEN NOT MATCHED AND s.o_custkey % 2 = 0 THEN INSERT *""",
      "update_scalar_subquery" ->
        """UPDATE gsq.default.s41 SET o_totalprice = o_totalprice * 2
          WHERE o_custkey > (SELECT max(o_custkey) FROM s41_base) - 500""",
      "delete_exists_correlated" ->
        """DELETE FROM gsq.default.s41 t WHERE EXISTS (
          SELECT 1 FROM s41_base b
          WHERE b.o_orderkey = t.o_orderkey AND b.o_custkey % 13 = 6)""",
      "delete_not_exists_sweep" ->
        """DELETE FROM gsq.default.s41 t WHERE NOT EXISTS (
          SELECT 1 FROM s41_base b
          WHERE b.o_orderkey = t.o_orderkey AND b.o_custkey % 17 != 3)""",
      "delete_not_in" ->
        """DELETE FROM gsq.default.s41 WHERE o_orderkey NOT IN (
          SELECT o_orderkey FROM s41_base WHERE o_custkey % 5 != 1)""",
      "delete_not_in_null_noop" ->
        """DELETE FROM gsq.default.s41 WHERE o_orderkey NOT IN (
          SELECT CASE WHEN o_custkey % 100 = 17 THEN NULL
                      ELSE o_orderkey END FROM s41_base)""",
      "final_select" ->
        """SELECT o_orderkey, o_custkey, o_totalprice
          FROM gsq.default.s41 ORDER BY o_orderkey""")

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    (1 to rounds).foreach { r =>
      spark.sql("DROP TABLE IF EXISTS gsq.default.s41")
      stmts.foreach { case (name, sql) =>
        val t0 = System.nanoTime()
        val df = spark.sql(sql)
        // collect(), not count(): count() lets EliminateSorts drop
        // the final ORDER BY and under-reports the select
        if (name == "final_select") df.collect() else ()
        val el = (System.nanoTime() - t0) / 1e9
        best(name) = best.get(name).fold(el)(math.min(_, el))
      }
    }
    val total = best.values.sum
    println("statement                      min-of-%d sec   share".format(rounds))
    best.foreach { case (n, t) =>
      println(f"$n%-30s $t%8.2f        ${100 * t / total}%4.1f%%")
    }
    println(f"TOTAL${" " * 25} $total%8.2f")
    spark.stop()
  }
}
