package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Graph

/** Decomposes g7_pagerank's cost: edge build vs rank iterations —
  * run before tuning either (dev tooling, same spirit as RecallProbe).
  *
  * Usage: runMain graft.tools.GraphProbe <sfDir> [iterations]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GRAPHPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e0 = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("w"))
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    t("edge_build_count")(println(s"  edges=${edges.count()}"))
    t(s"pagerank_iter$iters")(
      println(s"  ranks=${Graph.pageRank(edges, iters).count()}"))
    spark.stop()
  }
}
