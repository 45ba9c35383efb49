package graft.tools

import org.apache.spark.sql.SparkSession

object HistProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val w = java.nio.file.Files.createTempDirectory("hp").toString
    spark.conf.set("spark.sql.catalog.ghp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ghp.warehouse", w)
    val rows = ((0L until 19000L).map(_ => 0L) ++ (1L to 1000L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong % 2000L) }
    graft.ops.Snapshots.append(rows.toDF("k", "j"), s"$w/default/skew")
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    graft.ops.Snapshots.analyzeColumns(spark, s"$w/default/skew")
    val (_, cols) = graft.ops.Snapshots.analyzedStats(spark, s"$w/default/skew").get
    println("NDV=" + cols("k").ndv + " hist=" + cols("k").histogram.isDefined)
    cols("k").histogram.foreach { h =>
      println(s"height=${h.height} bins=${h.bins.length}")
      println("first5=" + h.bins.take(5).mkString(" "))
      println("last5=" + h.bins.takeRight(5).mkString(" "))
      println("binsWithZero=" + h.bins.count(b => b.lo <= 0.0 && b.hi >= 0.0))
      println("ndvZeroBins=" + h.bins.count(_.ndv == 0))
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    def est(k: Long) = spark.sql(s"SELECT * FROM ghp.default.skew WHERE k = $k")
      .queryExecution.optimizedPlan.stats.rowCount
    println("est0=" + est(0) + " est777=" + est(777))
    // also print colStats the plan sees
    val plan = spark.sql("SELECT * FROM ghp.default.skew WHERE k = 0").queryExecution.optimizedPlan
    println("attrStats=" + plan.stats.attributeStats.map{case (a,s)=>a.name -> (s.distinctCount, s.min, s.max, s.histogram.isDefined)})
    spark.stop()
  }
}
