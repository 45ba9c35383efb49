package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Times a fixed query list at two scale dirs and prints the growth
  * slope — the evidence behind BASELINE.md's scaling table. Queries are
  * warmed once (plan/codegen costs) before either measured run.
  *
  * Usage: runMain graft.tools.ScaleBench <smallDir> <bigDir> [q1,q2,...]
  */
object ScaleBench {
  private val DefaultQs =
    Seq("d5_ngram_jaccard", "d6_dedup_clusters", "d7_embed_dedup_clusters",
      "d9_keep_best_per_cluster", "x1_source_overlap")

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/graft_sf1")
    val qs = args.lift(2).map(_.split(",").toSeq).getOrElse(DefaultQs)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val warmDir = // warm plans on the smallest dir available
      if (new java.io.File("/root/testdata/sf0.001").isDirectory)
        "/root/testdata/sf0.001"
      else small
    qs.foreach(q => time(q, warmDir))
    val rows = qs.map { q =>
      val a = time(q, small)
      val b = time(q, big)
      (q, a, b, b / a)
    }
    println("SCALEBENCH query,small_s,big_s,ratio")
    rows.foreach { case (q, a, b, r) =>
      println(f"SCALEBENCH $q,$a%.2f,$b%.2f,$r%.2f")
    }
    spark.stop()
  }
}
