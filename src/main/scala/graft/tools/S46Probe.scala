package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables

/** Per-statement wall-time decomposition of `s46_update_matching` —
  * the UPDATE-verb pricing twin of [[S41Probe]], added when the
  * round-11 ANTI statements (whole-key-space sweeps by semantics)
  * joined the query. Statements verbatim from SinkQueries s46.
  *
  * Usage: runMain graft.tools.S46Probe <sfDir> [rounds]
  */
object S46Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: S46Probe <sfDir> [rounds]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_s46probe_" +
      ProcessHandle.current().pid()
    spark.conf.set("spark.sql.catalog.g46p", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g46p.warehouse", wh)
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") < 60000)
      .createOrReplaceTempView("s46_base")

    val stmts: Seq[(String, String)] = Seq(
      "ctas" ->
        "CREATE TABLE g46p.default.t AS SELECT * FROM s46_base",
      "update_exists_correlated" ->
        """UPDATE g46p.default.t t
          SET o_totalprice = o_totalprice + 1000.0
          WHERE EXISTS (SELECT 1 FROM s46_base b
            WHERE b.o_orderkey = t.o_orderkey AND b.o_custkey % 7 = 2
              AND b.o_orderkey < 40000)""",
      "update_in_uncorrelated" ->
        """UPDATE g46p.default.t SET o_totalprice = -o_totalprice
          WHERE o_orderkey IN (
            SELECT o_orderkey FROM s46_base
            WHERE o_custkey % 11 = 3
              AND o_orderkey BETWEEN 20000 AND 28000)""",
      "update_in_correlated" ->
        """UPDATE g46p.default.t t SET o_custkey = o_custkey + 1000000
          WHERE o_orderkey IN (SELECT b.o_orderkey FROM s46_base b
            WHERE b.o_custkey = t.o_custkey AND b.o_orderkey % 5 = 0
              AND b.o_orderkey BETWEEN 50000 AND 58000)""",
      "update_not_exists_sweep" ->
        """UPDATE g46p.default.t t
          SET o_totalprice = o_totalprice * 2.0
          WHERE NOT EXISTS (SELECT 1 FROM s46_base b
            WHERE b.o_orderkey = t.o_orderkey
              AND b.o_custkey % 13 != 5)""",
      "update_not_in_correlated" ->
        """UPDATE g46p.default.t t SET o_custkey = o_custkey - 500000
          WHERE o_orderkey NOT IN (
            SELECT b.o_orderkey FROM s46_base b
            WHERE b.o_custkey = t.o_custkey AND b.o_orderkey % 2 = 0)""",
      "final_select" ->
        """SELECT o_orderkey, o_custkey, o_totalprice
          FROM g46p.default.t ORDER BY o_orderkey""")

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    (1 to rounds).foreach { _ =>
      spark.sql("DROP TABLE IF EXISTS g46p.default.t")
      stmts.foreach { case (name, sql) =>
        val t0 = System.nanoTime()
        val df = spark.sql(sql)
        if (name == "final_select") df.count() else ()
        val el = (System.nanoTime() - t0) / 1e9
        best(name) = best.get(name).fold(el)(math.min(_, el))
      }
    }
    val total = best.values.sum
    println("statement                      min sec   share")
    best.foreach { case (n, t) =>
      println(f"$n%-30s $t%7.2f   ${100 * t / total}%4.1f%%")
    }
    println(f"TOTAL${" " * 25} $total%7.2f")
    spark.stop()
  }
}
