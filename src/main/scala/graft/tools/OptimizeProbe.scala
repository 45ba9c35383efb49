package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Prices [[Snapshots.optimizeIncremental]] against the full-rewrite
  * [[Snapshots.optimize]] on the maintenance shape that actually
  * recurs: a large clustered table that keeps receiving small appends.
  * Full optimize re-reads and re-writes EVERY byte per pass (O(table)
  * per night); the incremental pass re-clusters only the files
  * committed since the marker (O(debt)) — on a 100 TB table that is
  * the difference between an impossible nightly job and a bounded one.
  *
  * Usage: runMain graft.tools.OptimizeProbe <dir1x> <dir10x>
  * — each dir must hold orders.parquet. Per scale: table built from
  * orders + full first layout, then 5% debt appended, then
  * (a) FULL re-optimize elapsed vs (b) incremental elapsed, with the
  * files-rewritten counts that explain the gap.
  */
object OptimizeProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: OptimizeProbe <dir1x> [<dir10x>]")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.toSeq.zip(Seq("1x", "10x")).foreach { case (dir, tag) =>
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val n = base.count()
      val debtFrac = lit(20) // 5% of keys
      def fresh(): String =
        Files.createTempDirectory("graft_optinc").toFile.toString + "/t"

      // ---- incremental path: full layout once, then debt sweeps
      val rootI = fresh()
      Snapshots.append(base.filter(pmod(col("o_orderkey"), debtFrac) =!= 0)
        .repartition(32), rootI)
      val (_, tFirst) = ms(Snapshots.optimizeIncremental(spark, rootI,
        Seq("o_orderkey"), numFiles = 32))
      // 5% debt arrives as 4 small appends
      (0 until 4).foreach(i => Snapshots.append(
        base.filter(pmod(col("o_orderkey"), debtFrac) === 0 &&
          pmod(col("o_custkey"), lit(4)) === i).repartition(2), rootI))
      val filesBefore = Snapshots.read(spark, rootI).inputFiles.length
      val (vInc, tInc) = ms(Snapshots.optimizeIncremental(spark, rootI,
        Seq("o_orderkey"), numFiles = 8))
      val filesAfterI = Snapshots.read(spark, rootI).inputFiles.length

      // ---- full path: same debt state, whole-table re-optimize
      val rootF = fresh()
      Snapshots.append(base.filter(pmod(col("o_orderkey"), debtFrac) =!= 0)
        .repartition(32), rootF)
      Snapshots.optimize(spark, rootF, Seq("o_orderkey"), numFiles = 32)
      (0 until 4).foreach(i => Snapshots.append(
        base.filter(pmod(col("o_orderkey"), debtFrac) === 0 &&
          pmod(col("o_custkey"), lit(4)) === i).repartition(2), rootF))
      val (_, tFull) = ms(Snapshots.optimize(spark, rootF,
        Seq("o_orderkey"), numFiles = 32))

      // parity: both layouts hold identical content
      val sumI = Snapshots.read(spark, rootI)
        .agg(sum("o_orderkey")).head().getLong(0)
      val sumF = Snapshots.read(spark, rootF)
        .agg(sum("o_orderkey")).head().getLong(0)
      require(sumI == sumF, s"content drift: $sumI vs $sumF")

      println(f"[$tag] rows=$n first_full_layout=${tFirst / 1000}%.2fs " +
        f"debt_sweep_incremental=${tInc / 1000}%.2fs " +
        f"(files $filesBefore -> $filesAfterI, v$vInc) " +
        f"full_reoptimize=${tFull / 1000}%.2fs " +
        f"ratio=${tFull / tInc}%.1fx")
    }
    spark.stop()
  }
}
