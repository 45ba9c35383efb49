package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Prices [[Snapshots.convert]]'s in-place import against the
  * copy-through alternative ([[Snapshots.copyInto]]) across a file-
  * count decade, and [[Snapshots.analyzeColumns]] across a row-count
  * decade — the two round-12 surfaces whose 100 TB viability is a
  * claim until measured.
  *
  *   - convert is O(files) FOOTER reads + one manifest: its elapsed
  *     must track file count, not byte count, and sit far below
  *     copyInto (which re-writes every byte through Spark);
  *   - analyze is one aggregation pass: its elapsed must track rows
  *     roughly linearly (HLL++ partials merge associatively).
  *
  * Usage: runMain graft.tools.ConvertProbe <dir1x> <dir10x>
  * (each dir holds orders.parquet; 10x optional). */
object ConvertProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ConvertProbe <dir1x> [<dir10x>]")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.toSeq.zip(Seq("1x", "10x")).foreach { case (dir, tag) =>
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
      val rows = base.count()
      def freshDir(files: Int): String = {
        val d = Files.createTempDirectory(s"graft_cvp_$tag")
          .toFile.toString + "/raw"
        base.repartition(files, col("o_orderkey")).write.parquet(d)
        d
      }
      Seq(8, 80).foreach { files =>
        val raw = freshDir(files)
        val (r, tConvert) = ms(Snapshots.convert(spark, raw))
        // the same bytes ingested by copy: full read + full rewrite
        val dst = Files.createTempDirectory(s"graft_cvp_ci_$tag")
          .toFile.toString + "/t"
        val (_, tCopy) = ms(Snapshots.copyInto(spark, dst,
          raw.stripSuffix("/raw") + "/raw", "parquet"))
        // prune sanity: converted footer stats must skip files on a
        // key probe (bound-sound check, not a benchmark)
        val (kept, skipped) = Snapshots.pruneFiles(spark, raw,
          col("o_orderkey") === 1L)
        println(f"convert  $tag files=$files%3d rows=$rows%9d " +
          f"convert=${tConvert / 1000}%7.2fs copyInto=${tCopy / 1000}%7.2fs " +
          f"ratio=${tCopy / tConvert}%5.1fx pruned=${skipped.size}/" +
          s"${kept.size + skipped.size}")
      }
      // PARTITIONED convert (round 13): key=value layout — the extra
      // work over the flat case is one directory-probe read for
      // partition types plus one stat line per (file, key) parsed
      // driver-side from paths already listed. Elapsed must stay
      // O(files), tracking the flat figure, and the partition column
      // must prune
      locally {
        val d = Files.createTempDirectory(s"graft_cvp_part_$tag")
          .toFile.toString + "/raw"
        base.withColumn("shard", pmod(col("o_orderkey"), lit(8)))
          .repartition(10, col("o_orderkey"))
          .write.partitionBy("shard").parquet(d)
        val (r, tConvert) = ms(Snapshots.convert(spark, d))
        val (kept, skipped) = Snapshots.pruneFiles(spark, d,
          col("shard") === 3)
        println(f"convert  $tag PARTITIONED files=${r.files}%3d " +
          f"rows=${r.rows}%9d convert=${tConvert / 1000}%7.2fs " +
          s"partitionPruned=${skipped.size}/${kept.size + skipped.size}")
      }
      val t = Files.createTempDirectory(s"graft_anp_$tag")
        .toFile.toString + "/t"
      Snapshots.append(base, t)
      val (ar, tAnalyze) = ms(Snapshots.analyzeColumns(spark, t))
      println(f"analyze  $tag rows=${ar.rowCount}%9d " +
        f"cols=${ar.columns.size} elapsed=${tAnalyze / 1000}%7.2fs")
      // histogram build cost (round 13): the two extra sweeps
      // (percentiles + per-bin NDV) — must stay a small multiple of
      // the plain analyze pass, linear in rows
      val th = Files.createTempDirectory(s"graft_anp_h_$tag")
        .toFile.toString + "/t"
      Snapshots.append(base, th)
      spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
      val (ahr, tHist) =
        try ms(Snapshots.analyzeColumns(spark, th))
        finally spark.conf.set(
          "spark.sql.statistics.histogram.enabled", "false")
      println(f"analyze+hist $tag rows=${ahr.rowCount}%9d " +
        f"cols=${ahr.columns.size} elapsed=${tHist / 1000}%7.2fs " +
        f"vsPlain=${tHist / tAnalyze}%4.1fx")
    }
    spark.stop()
  }
}
