package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Snapshots

/** Evidence for the metadata-only snapshot surfaces: aggregateFromManifest
  * vs the equivalent scan aggregate, shallowClone vs a physical copy, and
  * history() — all of which must cost O(manifest), not O(data). Reports
  * wall millis for each against a multi-commit table built from the
  * given fixture dir's lineitem.
  *
  * Usage: runMain graft.tools.MetaBench [sfDir]
  */
object MetaBench {
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

    val root = Files.createTempDirectory("graft_metab").toFile.toString + "/t"
    val base = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
    (0 until 8).foreach(i => Snapshots.append(
      base.filter(pmod(col("l_orderkey"), lit(8)) === i), root))
    val nRows = Snapshots.read(spark, root).count()
    val nFiles = Snapshots.read(spark, root).inputFiles.length

    // warm both paths once (JIT + FS cache), then measure
    Snapshots.aggregateFromManifest(spark, root,
      Seq("l_quantity", "l_shipdate")).get.collect()
    Snapshots.read(spark, root)
      .agg(count(lit(1)), count(col("l_quantity")), min(col("l_quantity")),
        max(col("l_quantity")), min(col("l_shipdate")),
        max(col("l_shipdate"))).collect()

    val (_, tMeta) = ms(Snapshots.aggregateFromManifest(spark, root,
      Seq("l_quantity", "l_shipdate")).get.collect())
    val (_, tScan) = ms(Snapshots.read(spark, root)
      .agg(count(lit(1)), count(col("l_quantity")), min(col("l_quantity")),
        max(col("l_quantity")), min(col("l_shipdate")),
        max(col("l_shipdate"))).collect())

    val cloneDst = Files.createTempDirectory("graft_metab").toFile
      .toString + "/c"
    val (_, tClone) = ms(Snapshots.shallowClone(spark, root, cloneDst))
    val (h, tHist) = ms(Snapshots.history(spark, root).collect())

    println(f"table: $nRows rows, $nFiles files, ${h.length} versions")
    println(f"meta_agg_ms=$tMeta%.1f scan_agg_ms=$tScan%.1f " +
      f"ratio=${tScan / tMeta}%.1fx")
    println(f"shallow_clone_ms=$tClone%.1f history_ms=$tHist%.1f")
    spark.stop()
  }
}
