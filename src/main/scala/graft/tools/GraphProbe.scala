package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.ops.Graph

/** Decomposes g7_pagerank's cost: edge build vs the phases inside
  * [[Graph.pageRank]] (edge cache + window out-weight, node distinct,
  * per-iteration join+agg, final localCheckpoint) — run before tuning
  * either (dev tooling, same spirit as RecallProbe). Two rounds,
  * min-of-2, with a warm first pass so codegen/classload is paid.
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
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val el = (System.nanoTime() - t0) / 1e9
      best(label) = best.get(label).fold(el)(math.min(_, el))
      r
    }
    def edgeFrame() = {
      val e0 = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .agg(count(lit(1)).as("w"))
      e0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"),
          col("w"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"), col("w"))
    }
    // warm pass: full pipeline once, untimed
    Graph.pageRank(edgeFrame(), iters).count()
    (1 to 2).foreach { _ =>
      val edges = edgeFrame()
      t("edge_build_count")(edges.count())
      // phase decomposition mirroring Graph.pageRank internals
      val e = t("e_cache_window") {
        val f = edges.select(col("src"), col("dst"), col("w"))
          .withColumn("tw", sum(col("w")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
          .persist(StorageLevel.MEMORY_AND_DISK)
        f.count()
        f
      }
      val nodes = t("nodes_distinct") {
        val n = e.select(col("src").as("node"))
          .unionByName(e.select(col("dst").as("node")))
          .distinct().persist(StorageLevel.MEMORY_AND_DISK)
        n.count()
        n
      }
      t("max_tw_agg")(e.agg(max(col("tw"))).head)
      var rank = nodes.withColumn("rank", lit(Graph.Scale))
      (1 to iters).foreach { i =>
        t(s"iter_$i") {
          val contribs = e.join(broadcast(rank), e("src") === rank("node"))
            .select(col("dst").as("node"),
              expr("(rank div tw) * w + ((rank % tw) * w) div tw")
                .as("contrib"))
            .groupBy("node").agg(sum(col("contrib")).as("c"))
          rank = nodes.join(broadcast(contribs), Seq("node"), "left")
            .select(col("node"),
              (lit(150000000000L) +
                expr("(85 * coalesce(c, 0L)) div 100")).as("rank"))
          rank.count()
        }
      }
      t("local_checkpoint")(rank.localCheckpoint(eager = true))
      e.unpersist(); nodes.unpersist()
      t("pagerank_whole_verb")(Graph.pageRank(edgeFrame(), iters).count())
    }
    println(f"${"phase"}%-24s min sec")
    best.foreach { case (n, v) => println(f"$n%-24s $v%7.3f") }
    spark.stop()
  }
}
