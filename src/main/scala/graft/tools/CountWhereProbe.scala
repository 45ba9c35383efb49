package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Scale evidence for the stats-decided count
  * ([[Snapshots.countWhere]] / the SQL `count(*) WHERE` rewrite): on a
  * range-clustered table, a window-count's cost must be O(boundary
  * files), not O(window rows) — elapsed should stay ~flat across a
  * decade of growth while the full-scan count it replaces grows with
  * the data. Also prices the window FULLY covered by decided files
  * (zero scan) and the adversarial undecidable predicate (all files
  * scan — the honest worst case equals the plan it replaces).
  *
  * Usage: runMain graft.tools.CountWhereProbe <dir1x> <dir10x>
  * (e.g. /root/testdata/sf0.1 /tmp/graft_sf1) — each dir must hold
  * orders.parquet. Prints one line per (scale, shape): elapsed ms,
  * count, decided/scanned/pruned files.
  */
object CountWhereProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CountWhereProbe <dir1x> <dir10x>")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.zip(Seq("1x", "10x")).foreach { case (dir, tag) =>
      val root = Files.createTempDirectory(s"graft_cwprobe_$tag")
        .toFile.toString + "/t"
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // the maintained layout: 32 files with disjoint key ranges
      Snapshots.append(base.repartitionByRange(32, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root)
      val maxKey = Snapshots.read(spark, root)
        .agg(max("o_orderkey")).head().getLong(0)
      // a mid-table window ~40% of the key space: interior files
      // decide from stats, the two boundary files scan
      val (lo, hi) = (maxKey / 4, maxKey / 4 + (maxKey * 2) / 5)
      val window = col("o_orderkey") >= lo && col("o_orderkey") < hi

      def report(shape: String, pred: org.apache.spark.sql.Column): Unit = {
        val (r, t) = ms(Snapshots.countWhere(spark, root, pred))
        val (full, tFull) = ms(
          Snapshots.read(spark, root).filter(pred).count())
        require(full == r.count,
          s"$tag/$shape: stats-decided ${r.count} != scan $full")
        println(f"$tag%-4s $shape%-12s decided=$t%9.1fms " +
          f"fullscan=$tFull%9.1fms count=${r.count}%10d " +
          f"files all=${r.allMatchFiles} scan=${r.scannedFiles} " +
          f"pruned=${r.prunedFiles}")
      }

      report("window", window)
      report("undecidable", pmod(col("o_custkey"), lit(97)) === 13)
      // every file decided all-match: zero scanned, pure metadata
      report("everything", col("o_orderkey") >= 0)
    }
    spark.stop()
  }
}
