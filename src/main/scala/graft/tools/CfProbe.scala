package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Snapshots

/** Change-feed cost model, measured: does [[Snapshots.changeFeed]]'s
  * plan stay O(append-runs + DML commits) rather than O(versions), and
  * does a backlog read cost what the data (not the history shape)
  * costs?
  *
  *   1. 60-version APPEND-ONLY backlog: the feed must plan ONE scan
  *      over exactly the appended files (run coalescing) — compare its
  *      wall time against a plain read of the same table.
  *   2. The same backlog with 3 DML commits interleaved (merge,
  *      CoW delete, DV delete): 4 runs + 3 file-pruned diffs — wall
  *      time should grow by the diffs' touched files, not explode.
  *   3. Plan-shape evidence: count parquet scan nodes in both plans.
  *
  * Usage: runMain graft.tools.CfProbe [sfDir]
  */
object CfProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")

    def scanCount(df: org.apache.spark.sql.DataFrame): Int =
      // count parquet leaf scans in the OPTIMIZED plan (the executed
      // plan hides leaves under the un-expanded AQE root)
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.size

    // 1. pure append backlog: 60 versions
    val a = Files.createTempDirectory("graft_cf_a").toFile.toString + "/t"
    (0 until 60).foreach(i => Snapshots.append(
      base.filter(pmod(col("o_orderkey"), lit(60)) === i).coalesce(1), a))
    val feedA = Snapshots.changeFeed(spark, a, 0)
    val (nA, tA) = ms(feedA.count())
    val (nRead, tRead) = ms(Snapshots.read(spark, a).count())
    println(s"append_only: versions=60 feed_rows=$nA " +
      f"feed_ms=$tA%.0f plain_read_ms=$tRead%.0f " +
      s"feed_scans=${scanCount(feedA)} (run coalescing => 1)")
    assert(nA == nRead, s"$nA != $nRead")

    // 2. the same backlog with DML interleaved at v21/v41/v61
    val b = Files.createTempDirectory("graft_cf_b").toFile.toString + "/t"
    (0 until 20).foreach(i => Snapshots.append(
      base.filter(pmod(col("o_orderkey"), lit(60)) === i).coalesce(1), b))
    Snapshots.merge(spark, b,
      base.filter(pmod(col("o_orderkey"), lit(60)) === 3)
        .withColumn("o_totalprice", -col("o_totalprice")),
      Seq("o_orderkey"))
    (20 until 40).foreach(i => Snapshots.append(
      base.filter(pmod(col("o_orderkey"), lit(60)) === i).coalesce(1), b))
    Snapshots.deleteWhere(spark, b, pmod(col("o_custkey"), lit(1000)) === 7)
    (40 until 60).foreach(i => Snapshots.append(
      base.filter(pmod(col("o_orderkey"), lit(60)) === i).coalesce(1), b))
    Snapshots.deleteWhereLight(spark, b,
      pmod(col("o_orderkey"), lit(37501)) === 7L)
    val feedB = Snapshots.changeFeed(spark, b, 0)
    val (nB, tB) = ms(feedB.count())
    println(s"mixed_history: versions=63 feed_rows=$nB " +
      f"feed_ms=$tB%.0f feed_scans=${scanCount(feedB)} " +
      s"(3 runs + 3 diffs; scans stay O(runs + DML), not O(versions))")
    spark.stop()
  }
}
