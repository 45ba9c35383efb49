package graft.tools

import org.apache.spark.sql.SparkSession

/** Decade evidence for the staleness-aware statistics path: consulting
  * the LIVE row count on a drifted table ([[graft.ops.Snapshots
  * .analyzedStats]] → liveRowsOfManifest) must cost O(manifest
  * entries) — no job, no data read — so it can run on every
  * statistics load. Two axes:
  *
  *   - ROW decade at fixed commit count: 10× the rows per commit must
  *     NOT move the drift-consult latency (the manifest has the same
  *     number of lines; only the data grew);
  *   - FILE decade at fixed rows: 10× the commits grows the manifest
  *     10× — the consult may scale linearly with that (it reads
  *     per-file stats lines), which is the claim, not a violation.
  *
  * A full re-ANALYZE is timed alongside for contrast (a distributed
  * two-pass scan — what the drift path saves on every load). */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.Snapshots

    def build(dir: String, commits: Int, rowsPer: Int): Unit = {
      Snapshots.append((0 until rowsPer).map(i => (i.toLong, s"v$i"))
        .toDF("k", "s"), dir)
      Snapshots.analyzeColumns(spark, dir)
      (1 until commits).foreach { c =>
        Snapshots.append((0 until rowsPer)
          .map(i => ((c * rowsPer + i).toLong, s"v$i")).toDF("k", "s"), dir)
      }
    }
    def consultMs(dir: String): Double = {
      // warm once (FS metadata cache), then average the steady state
      Snapshots.analyzedStats(spark, dir)
      val n = 10
      val t0 = System.nanoTime()
      var live = 0L
      (0 until n).foreach { _ =>
        live = Snapshots.analyzedStats(spark, dir).map(_._1).getOrElse(-1L)
      }
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"  consult=$ms%.1f ms/load (live rows=$live)")
      ms
    }
    def analyzeMs(dir: String): Double = {
      val t0 = System.nanoTime()
      Snapshots.analyzeColumns(spark, dir)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"  full ANALYZE=$ms%.0f ms")
      ms
    }

    val base = java.nio.file.Files.createTempDirectory("driftp").toString
    println("== row decade, fixed 20 commits ==")
    println("1x rows (20 x 5k):")
    build(s"$base/a", 20, 5000)
    val a = consultMs(s"$base/a"); analyzeMs(s"$base/a")
    println("10x rows (20 x 50k):")
    build(s"$base/b", 20, 50000)
    val b = consultMs(s"$base/b"); analyzeMs(s"$base/b")
    println(f"row-decade consult ratio: ${b / a}%.2f (claim: ~flat)")

    println("== file decade, fixed 5k rows/commit ==")
    println("10x commits (200 x 5k):")
    build(s"$base/c", 200, 5000)
    val c = consultMs(s"$base/c")
    println(f"file-decade consult ratio vs 20-commit: ${c / a}%.2f " +
      "(claim: <= ~linear in manifest entries)")
    spark.stop()
  }
}
