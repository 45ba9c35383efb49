package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Snapshots

/** Is the SQL-over-catalog path's overhead MANIFEST-BOUNDED — i.e.
  * constant-ish per statement, independent of data volume and of how
  * many tables share the warehouse? The reads compile to the same
  * native parquet plan as the Scala API (GraftResolution swaps the
  * DSv2 relation), so the only candidate costs are catalog resolution
  * (existence probe + manifest head) and the plan swap itself. Three
  * probes, each reporting wall times:
  *
  *   1. PLAN cost vs DATA SCALE: the same point-predicate SELECT
  *      planned (executedPlan forced, nothing executed) against a
  *      1× corpus table and a 10× corpus table — if planning reads
  *      manifests, not data, the two are the same.
  *   2. SQL vs Scala END-TO-END at 1×: identical point query through
  *      `spark.sql` and through `Snapshots.readWhere` — the gap IS
  *      the whole SQL-path tax (analysis + swap + catalog).
  *   3. MANY-TABLE warehouse: 200 tables; per-table SELECT planning
  *      must not grow with warehouse size (no warehouse-wide
  *      listing on the read path), and SHOW TABLES is one directory
  *      listing.
  *
  * Usage: runMain graft.tools.SqlPathProbe [sfDir] [sfBigDir]
  */
object SqlPathProbe {
  private def ms[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e6
  }
  private def minOf(n: Int)(body: => Unit): Double =
    (1 to n).map(_ => ms(body)).min

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigDir = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = Files.createTempDirectory("graft_sqlprobe_wh").toFile.toString
    spark.conf.set("spark.sql.catalog.gsp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsp.warehouse", wh)

    // 1x and 10x snapshot tables in the warehouse (one append each)
    def build(name: String, dir: String): Unit =
      Snapshots.append(Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
        s"$wh/default/$name")
    build("small", sfDir)
    val haveBig = new java.io.File(s"$bigDir/orders.parquet").exists()
    if (haveBig) build("big", bigDir)

    def planOnly(sql: String): Unit = {
      spark.sql(sql).queryExecution.executedPlan // force planning
      ()
    }
    val q = "SELECT o_totalprice FROM gsp.default.%s WHERE o_orderkey = 4711"
    planOnly(q.format("small")) // warm classloading
    val pSmall = minOf(5)(planOnly(q.format("small")))
    val pBig = if (haveBig) minOf(5)(planOnly(q.format("big"))) else -1.0
    val fSmall = Snapshots.read(spark, s"$wh/default/small").inputFiles.length
    val fBig = if (haveBig)
      Snapshots.read(spark, s"$wh/default/big").inputFiles.length else -1
    // planning is MANIFEST-bounded: O(listed files), never O(rows) —
    // the honest check is ms-per-file staying flat across the decade
    println(f"plan_ms_1x=$pSmall%.1f (files=$fSmall) " +
      f"plan_ms_10x=$pBig%.1f (files=$fBig) " +
      f"ms_per_file_1x=${pSmall / fSmall}%.2f " +
      f"ms_per_file_10x=${pBig / math.max(1, fBig)}%.2f")

    // 2. end-to-end SQL vs Scala, same point query
    val eSql = minOf(3)(spark.sql(q.format("small")).collect())
    val eScala = minOf(3)(
      Snapshots.readWhere(spark, s"$wh/default/small",
        col("o_orderkey") === 4711L)
        .select("o_totalprice").collect())
    println(f"exec_ms_sql=$eSql%.1f exec_ms_scala=$eScala%.1f " +
      f"sql_tax_ms=${eSql - eScala}%.1f")

    // 3. many-table warehouse: planning per table must not grow
    val one = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey").limit(100).coalesce(1)
    (0 until 200).foreach(i => Snapshots.append(one, s"$wh/default/t$i"))
    val pOneOf200 = minOf(5)(planOnly(
      "SELECT * FROM gsp.default.t7 WHERE o_orderkey = 1"))
    val showAll = ms(spark.sql("SHOW TABLES IN gsp.default").collect())
    println(f"plan_ms_one_of_202_tables=$pOneOf200%.1f " +
      f"show_tables_202_ms=$showAll%.1f")
    spark.stop()
  }
}
