package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Snapshots

/** Per-phase decomposition of the `s53_replicate` bench query — the
  * s41 discipline: when one query is a pipeline of committed
  * operations, the BASELINE records what each phase costs so the next
  * regression is attributable to a phase, not the whole query.
  * MIRRORS the s53 body in queries/SinkQueries.scala — keep the two
  * in sync when the query changes.
  *
  * Usage: runMain graft.tools.S53Probe [sfDir]
  */
object S53Probe {
  private def ms[A](what: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"$what%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stage = java.nio.file.Files.createTempDirectory("graft_s53p")
      .toFile.toString
    val src = s"$stage/s53_src"; val dst = s"$stage/s53_dst"
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") < 40000)
    ms("append waves")(
      Snapshots.append(
        base.filter(pmod(col("o_orderkey"), lit(4)) < 2), src))
    ms("first sync")(
      Snapshots.replicate(spark, src, dst, Seq("o_orderkey")))
    ms("src append")(Snapshots.append(
      base.filter(pmod(col("o_orderkey"), lit(4)) === 2), src))
    ms("src update")(Snapshots.updateMatching(spark, src,
      Snapshots.read(spark, src)
        .filter(pmod(col("o_orderkey"), lit(10)) === 3)
        .select("o_orderkey"),
      Seq("o_orderkey"),
      Seq("o_totalprice" -> (col("o_totalprice") + 100000.0))))
    ms("src delete")(Snapshots.deleteMatching(spark, src,
      Snapshots.read(spark, src)
        .filter(pmod(col("o_orderkey"), lit(10)) === 7)
        .select("o_orderkey"),
      Seq("o_orderkey")))
    ms("src compact")(Snapshots.compact(spark, src, 4))
    ms("incremental sync")(
      Snapshots.replicate(spark, src, dst, Seq("o_orderkey")))
    ms("no-op sync")(
      Snapshots.replicate(spark, src, dst, Seq("o_orderkey")))
    ms("final aggregate")(
      Snapshots.read(spark, dst).groupBy("o_custkey").count().count())
    spark.stop()
  }
}
