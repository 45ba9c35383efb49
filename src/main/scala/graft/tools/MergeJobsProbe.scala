package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.Tables

/** Per-JOB decomposition of ONE SQL statement (default: s41's
  * merge_conditional, its most expensive statement at 39% of the
  * query): a listener records every Spark job's callsite and wall
  * time while the statement runs, so the fixed costs inside the merge
  * path (dup probe, footprint collect, classification take(1)s,
  * stage write, stats) are attributable line-by-line.
  *
  * Usage: runMain graft.tools.MergeJobsProbe <sfDir>
  */
object MergeJobsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_mjprobe_" +
      ProcessHandle.current().pid()
    spark.conf.set("spark.sql.catalog.gmj", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmj.warehouse", wh)
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView("mj_base")
    spark.sql("""SELECT o_orderkey, o_custkey, o_totalprice
      FROM mj_base WHERE o_orderkey % 53 = 1
      UNION ALL
      SELECT o_orderkey + 20000000, o_custkey, o_totalprice
      FROM mj_base WHERE o_orderkey % 53 = 2""")
      .createOrReplaceTempView("mj_src")
    // warm the WHOLE merge path on a scratch table so codegen,
    // classload and rule-engine warmup are paid before measurement
    spark.sql("CREATE TABLE gmj.default.warm AS SELECT * FROM mj_base")
    spark.sql("""MERGE INTO gmj.default.warm t USING mj_src s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED AND s.o_totalprice > 300000.0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
      WHEN NOT MATCHED AND s.o_custkey % 2 = 0 THEN
        INSERT (o_orderkey, o_custkey, o_totalprice)
        VALUES (s.o_orderkey, s.o_custkey, s.o_totalprice)""")
    spark.sql("CREATE TABLE gmj.default.s41 AS SELECT * FROM mj_base")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        starts.put(js.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (site, t0) =>
          rows.add((je.jobId, site, (System.nanoTime() - t0) / 1e9))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    spark.sql("""MERGE INTO gmj.default.s41 t USING mj_src s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED AND s.o_totalprice > 300000.0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
      WHEN NOT MATCHED AND s.o_custkey % 2 = 0 THEN
        INSERT (o_orderkey, o_custkey, o_totalprice)
        VALUES (s.o_orderkey, s.o_custkey, s.o_totalprice)""")
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    println(f"${"job"}%-5s ${"callsite"}%-52s sec")
    all.foreach { case (id, site, s) =>
      println(f"$id%-5d $site%-52s $s%7.3f")
    }
    println(f"jobs total ${all.map(_._3).sum}%.3f s, statement wall $wall%.3f s")
    spark.stop()
  }
}
