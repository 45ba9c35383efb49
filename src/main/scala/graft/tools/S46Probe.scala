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
      .filter(col("o_orderkey") < graft.queries.SinkQueries.S46KeyBound)
      .createOrReplaceTempView("s46_base")

    // the SHARED statement list — the probe times exactly what the
    // bench query runs, no hand-copied drift channel
    val stmts = graft.queries.SinkQueries.s46Statements("g46p")

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    (1 to rounds).foreach { _ =>
      spark.sql("DROP TABLE IF EXISTS g46p.default.t")
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
    println("statement                      min sec   share")
    best.foreach { case (n, t) =>
      println(f"$n%-30s $t%7.2f   ${100 * t / total}%4.1f%%")
    }
    println(f"TOTAL${" " * 25} $total%7.2f")
    spark.stop()
  }
}
