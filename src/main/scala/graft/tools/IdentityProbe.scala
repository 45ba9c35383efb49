package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ops.Snapshots

/** Prices IDENTITY assignment on the ingest path: an identity table's
  * append pays (a) the pin (persist + count of the incoming frame),
  * (b) one per-partition NULL-count job, and (c) the `mapPartitions`
  * row pass that patches the id slots — versus a plain append of the
  * same frame. No shuffle is added at ANY scale (the offsets travel
  * by broadcast), so the overhead is the row-pass constant — this
  * probe measures it at 1× and 10× to pin the slope.
  *
  * Usage: runMain graft.tools.IdentityProbe <dir1x> [<dir10x>]
  * — each dir must hold orders.parquet.
  */
object IdentityProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IdentityProbe <dir1x> [<dir10x>]")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = Files.createTempDirectory("graft_idprobe").toFile.toString
    spark.conf.set("spark.sql.catalog.gip", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gip.warehouse", wh)

    args.zip(Seq("1x", "10x")).foreach { case (dir, tag) =>
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(DoubleType).as("o_totalprice"))
        .repartition(32, pmod(col("o_orderkey"), lit(97)))
        .persist()
      val n = base.count() // materialize once so both sides scan cache

      spark.sql(s"DROP TABLE IF EXISTS gip.default.plain_$tag")
      spark.sql(s"DROP TABLE IF EXISTS gip.default.ident_$tag")
      spark.sql(
        s"""CREATE TABLE gip.default.plain_$tag (
           |  o_orderkey BIGINT, o_custkey BIGINT,
           |  o_totalprice DOUBLE)""".stripMargin)
      spark.sql(
        s"""CREATE TABLE gip.default.ident_$tag (
           |  id BIGINT GENERATED ALWAYS AS IDENTITY,
           |  o_orderkey BIGINT, o_custkey BIGINT,
           |  o_totalprice DOUBLE)""".stripMargin)

      val (_, plainMs) =
        ms(Snapshots.append(base, s"$wh/default/plain_$tag"))
      val (_, identMs) =
        ms(Snapshots.append(base, s"$wh/default/ident_$tag"))
      // the ids must be exactly 1..n and unique — pay the check
      // outside the timed region
      val ids = spark.read.format("graft-snapshots")
        .load(s"$wh/default/ident_$tag")
        .agg(count(lit(1)), countDistinct(col("id")),
          min(col("id")), max(col("id"))).head()
      require(ids.getLong(0) == n && ids.getLong(1) == n &&
        ids.getLong(2) == 1L && ids.getLong(3) == n,
        s"identity contract violated: $ids vs n=$n")
      println(f"$tag%4s rows=$n%9d plain_append=${plainMs / 1000}%.2fs " +
        f"identity_append=${identMs / 1000}%.2fs " +
        f"overhead=${(identMs - plainMs) / 1000}%.2fs " +
        f"(${(identMs / plainMs - 1) * 100}%.0f%%)")
      base.unpersist()
    }
    spark.stop()
  }
}
