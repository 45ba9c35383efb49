package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Scale evidence for the round-8 DML verbs: a point UPDATE and a
  * narrow CDC tombstone batch against a key-clustered snapshot table
  * must touch the KEYS' files, not the table — rewritten-file counts
  * should stay ~flat across a decade of table growth while untouched
  * files (carried by name, never read) grow linearly.
  *
  * Usage: runMain graft.tools.DmlScaleProbe <ordersDir1x> <ordersDir10x>
  * (e.g. /root/testdata/sf0.1 /tmp/graft_sf1) — each dir must hold
  * orders.parquet. Prints one line per (scale, op): elapsed, rewritten,
  * untouched.
  */
object DmlScaleProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: DmlScaleProbe <dir1x> <dir10x>")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.zip(Seq("1x", "10x")).foreach { case (dir, tag) =>
      val root = Files.createTempDirectory(s"graft_dmlscale_$tag")
        .toFile.toString + "/t"
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // range-clustered on the key — the layout a maintained table has
      // after key-ordered OPTIMIZE: 32 files with disjoint key ranges,
      // so per-file min/max stats answer point predicates exactly
      Snapshots.append(base.repartitionByRange(32, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root)
      val n = Snapshots.read(spark, root).count()
      val maxKey = Snapshots.read(spark, root)
        .agg(max("o_orderkey")).head().getLong(0)

      // point UPDATE: one key
      val (u, tUpd) = ms(Snapshots.updateWhere(spark, root,
        col("o_orderkey") === maxKey / 2,
        Seq("o_totalprice" -> lit(0.0))))
      // narrow tombstone batch: 200 keys in a tight range
      val ts = spark.range(maxKey / 4, maxKey / 4 + 200)
        .toDF("o_orderkey")
      val (d, tDel) = ms(Snapshots.deleteMatching(spark, root, ts,
        Seq("o_orderkey")))

      // scoped overwrite: re-load a tight key range (the daily
      // backfill shape) — staged/dropped should track the SLICE, the
      // untouched remainder the table
      val lo = maxKey / 2; val hi = maxKey / 2 + 400
      val load = spark.range(lo, hi, 4).coalesce(1)
        .select(col("id").as("o_orderkey"), lit(7L).as("o_custkey"),
          lit(1.0).as("o_totalprice"))
      val (rp, tRpl) = ms(Snapshots.replaceWhere(spark, root,
        col("o_orderkey") >= lo && col("o_orderkey") < hi, load))

      // retention sweep (the NOT EXISTS anti-delete shape): the
      // reference set holds every key except a tight expired range —
      // the anti-join reads the key COLUMN of the table (intrinsic to
      // the semantics, column-pruned) but the rewrite must track only
      // the expired keys' files, not the table
      val lo2 = maxKey / 8; val hi2 = maxKey / 8 + 100
      val keepSet = Snapshots.read(spark, root).select("o_orderkey")
        .filter(!col("o_orderkey").between(lit(lo2), lit(hi2)))
      val tomb2 = Snapshots.read(spark, root).select("o_orderkey")
        .na.drop().distinct()
        .join(keepSet, Seq("o_orderkey"), "left_anti")
      val (ad, tAnti) = ms(Snapshots.deleteMatching(spark, root, tomb2,
        Seq("o_orderkey")))

      println(f"$tag%-4s rows=$n%-9d update: ${tUpd / 1000}%.2fs " +
        f"rewritten=${u.rewrittenFiles} untouched=${u.untouchedFiles}  " +
        f"tombstones: ${tDel / 1000}%.2fs rewritten=${d.rewrittenFiles} " +
        f"untouched=${d.untouchedFiles}  " +
        f"replace: ${tRpl / 1000}%.2fs staged=${rp.stagedFiles} " +
        f"dropped=${rp.droppedFiles} untouched=${rp.untouchedFiles}  " +
        f"anti-sweep: ${tAnti / 1000}%.2fs rewritten=${ad.rewrittenFiles} " +
        f"untouched=${ad.untouchedFiles}")
    }
    spark.stop()
  }
}
