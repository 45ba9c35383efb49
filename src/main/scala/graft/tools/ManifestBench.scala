package graft.tools

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Measures snapshot-table COMMIT METADATA growth over a long append
  * history — the evidence for the delta-manifest design. For N
  * single-file appends it reports the actual manifest bytes on disk
  * (delta format: O(batch) per commit + a full checkpoint every 8) and
  * the bytes the full-manifest-per-commit format would have written
  * (commit k re-lists all k files and their stats: O(N²/2) total), plus
  * wall time per commit decade to show append latency stays flat.
  *
  * Usage: runMain graft.tools.ManifestBench [nCommits]
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft_mbench").toFile.toString + "/t"
    val rootP = new HPath(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // per-commit wall time, sampled each decade of the history
    val times = new Array[Double](n)
    (0 until n).foreach { i =>
      val t0 = System.nanoTime()
      Snapshots.append(
        Seq.tabulate(100)(j => (i.toLong * 1000 + j, s"batch$i"))
          .toDF("id", "tag").repartition(1), root)
      times(i) = (System.nanoTime() - t0) / 1e9
    }

    val manifests = fs.listStatus(new HPath(rootP, "_manifests"))
      .filter(_.getPath.getName.matches("v[0-9]{9}"))
      .sortBy(_.getPath.getName)
    val actualBytes = manifests.map(_.getLen).sum
    val lastFull = manifests.map(_.getLen).max
    // what full-per-commit would cost: commit k's manifest re-lists all
    // k files and their stats — model each commit as the OBSERVED full
    // checkpoint scaled by k / filesAtCheckpoint (line size is uniform:
    // one file line + one size line + two stat lines per file)
    val filesNow = Snapshots.read(spark, root).inputFiles.length
    val perFileBytes = lastFull.toDouble / filesNow
    val fullBytes = (1 to n).map(k => perFileBytes * k).sum.toLong

    def decade(lo: Int, hi: Int): Double = {
      val slice = times.slice(lo, hi)
      slice.sum / slice.length
    }
    println(f"commits=$n files=$filesNow")
    println(f"manifest_bytes_delta=$actualBytes " +
      f"manifest_bytes_full_model=$fullBytes " +
      f"ratio=${fullBytes.toDouble / actualBytes}%.1fx")
    println(f"append_sec_first10=${decade(0, 10)}%.3f " +
      f"mid10=${decade(n / 2 - 5, n / 2 + 5)}%.3f " +
      f"last10=${decade(n - 10, n)}%.3f")
    spark.stop()
  }
}
