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
  // job-time accounting: jobs-vs-wall per phase separates executor
  // work from driver-side planning (the merge_conditional lesson)
  private val jobSec = new java.util.concurrent.atomic.DoubleAdder()
  private def ms[A](what: String)(body: => A): A = {
    val j0 = jobSec.sum()
    val t0 = System.nanoTime()
    val r = body
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(50) // let job-end events drain
    println(f"$what%-24s $wall%6.2f s  (jobs ${jobSec.sum() - j0}%5.2f s)")
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, System.nanoTime())
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.remove(je.jobId)).foreach(t0 =>
            jobSec.add((System.nanoTime() - t0) / 1e9))
      })
    val stage = java.nio.file.Files.createTempDirectory("graft_s53p")
      .toFile.toString
    val src = s"$stage/s53_src"; val dst = s"$stage/s53_dst"
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") < 40000)
    ms("append waves")(
      Snapshots.append(
        base.filter(pmod(col("o_orderkey"), lit(4)) < 2), src))
    val r1 = ms("first sync")(
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
    // the incremental window's feed, evaluated standalone (count is
    // read-only: the mark does not advance) — twice, to separate the
    // one-time costs from the steady evaluation
    ms("feed eval (count)")(
      Snapshots.changeFeed(spark, src, r1.toVersion).count())
    ms("feed eval again")(
      Snapshots.changeFeed(spark, src, r1.toVersion).count())
    ms("incremental sync")(
      Snapshots.replicate(spark, src, dst, Seq("o_orderkey")))
    ms("no-op sync")(
      Snapshots.replicate(spark, src, dst, Seq("o_orderkey")))
    ms("final aggregate")(
      Snapshots.read(spark, dst).groupBy("o_custkey").count().count())
    spark.stop()
  }
}
