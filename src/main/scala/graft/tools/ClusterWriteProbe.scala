package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.ops.Snapshots

/** Prices write-time clustering ([[Snapshots.clusterForWrite]]) both
  * ways: the ingest pays a range exchange (sampling pass + shuffle —
  * the standard Spark range-partition cost), and every subsequent
  * stats consumer (point lookups, window counts, DML footprints)
  * gets first-append pruning instead of waiting for OPTIMIZE.
  *
  * Usage: runMain graft.tools.ClusterWriteProbe <dir1x> <dir10x>
  * — each dir must hold orders.parquet. Per scale: append elapsed
  * with shaping OFF vs ON (same 32-partition hash-scattered input),
  * then the point-lookup and window-count file footprints on each
  * layout.
  */
object ClusterWriteProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ClusterWriteProbe <dir1x> <dir10x>")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType)))

    args.zip(Seq("1x", "10x")).foreach { case (dir, tag) =>
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(DoubleType))
        .repartition(32, pmod(col("o_orderkey"), lit(97)))
      val maxKey = base.agg(max("o_orderkey")).head().getLong(0)
      val point = col("o_orderkey") === maxKey / 2
      val window = col("o_orderkey") >= maxKey / 4 &&
        col("o_orderkey") < maxKey / 2

      Seq(false, true).foreach { shaped =>
        val root = Files.createTempDirectory(s"graft_cwp_$tag")
          .toFile.toString + "/t"
        Snapshots.createTable(spark, root, schema,
          properties = Map("cluster.columns" -> "o_orderkey"))
        spark.conf.set("spark.graft.write.clusterOnWrite",
          shaped.toString)
        val (_, tApp) = ms(Snapshots.append(base, root))
        spark.conf.unset("spark.graft.write.clusterOnWrite")
        val pointKept = Snapshots.pruneFiles(spark, root, point)._1.size
        val (w, tWin) = ms(Snapshots.countWhere(spark, root, window))
        println(f"$tag%-4s shaped=$shaped%-5s append=$tApp%9.1fms " +
          f"pointKept=$pointKept%3d windowScan=${w.scannedFiles}%3d " +
          f"windowDecided=${w.allMatchFiles}%3d window=$tWin%9.1fms")
      }
    }
    spark.stop()
  }
}
