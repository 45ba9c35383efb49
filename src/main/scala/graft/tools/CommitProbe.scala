package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Snapshots

/** Wall-time decomposition of ONE snapshot commit's fixed costs — the
  * round-15 evidence for "cut per-commit fixed cost" (VERDICT item 2):
  * times a full `Snapshots.append` against its separable ingredients
  * (parquet write, read-back stats aggregate with and without an
  * explicit schema, directory listing), each min-of-N.
  *
  * Usage: runMain graft.tools.CommitProbe <sfDir> [rounds]
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CommitProbe <sfDir> [rounds]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cprobe")
      .toFile.toString
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    base.count() // warm the source scan

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val el = (System.nanoTime() - t0) / 1e9
      best(name) = best.get(name).fold(el)(math.min(_, el))
    }

    (1 to rounds).foreach { r =>
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)

      // ingredient 1: the bare parquet write of one append's slice
      val w1 = s"$tmp/w$r"
      time("bare parquet write") {
        base.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .write.parquet(w1)
      }
      // ingredient 2: read-back stats aggregate as collectStats does
      time("stats agg (inferred schema)") {
        val data = spark.read.parquet(w1)
        data.groupBy(input_file_name().as("__f"))
          .agg(count(lit(1L)), min(col("o_orderkey")), max(col("o_orderkey")),
            count(col("o_orderkey")), min(col("o_custkey")),
            max(col("o_custkey")), count(col("o_custkey")),
            min(col("o_totalprice")), max(col("o_totalprice")),
            count(col("o_totalprice")))
          .collect()
      }
      time("stats agg (explicit schema)") {
        val data = spark.read.schema(base.schema).parquet(w1)
        data.groupBy(input_file_name().as("__f"))
          .agg(count(lit(1L)), min(col("o_orderkey")), max(col("o_orderkey")),
            count(col("o_orderkey")), min(col("o_custkey")),
            max(col("o_custkey")), count(col("o_custkey")),
            min(col("o_totalprice")), max(col("o_totalprice")),
            count(col("o_totalprice")))
          .collect()
      }
      // ingredient 3: listing
      time("listStatus") {
        fs.listStatus(new org.apache.hadoop.fs.Path(w1))
      }
      // the whole verb, fresh root each time: 1 append on empty table
      val a1 = s"$tmp/a$r"
      time("append v1 (full verb)") {
        Snapshots.append(
          base.filter(pmod(col("o_orderkey"), lit(10)) === 0), a1)
      }
      time("append v2 (full verb)") {
        Snapshots.append(
          base.filter(pmod(col("o_orderkey"), lit(10)) === 1), a1)
      }
      time("read+count after 2 appends") {
        Snapshots.read(spark, a1).count(): Unit
      }
      fs.delete(new org.apache.hadoop.fs.Path(w1), true)
      fs.delete(new org.apache.hadoop.fs.Path(a1), true)
    }
    println(f"${"phase"}%-32s min sec")
    best.foreach { case (n, t) => println(f"$n%-32s $t%7.3f") }
    spark.stop()
  }
}
