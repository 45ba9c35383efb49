package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Prices [[Snapshots.replicate]]'s incremental path against the
  * full-resync strawman on the shape that recurs in production: a
  * large replicated table that keeps receiving a bounded daily DML
  * batch. Full resync re-reads and re-writes EVERY byte per run
  * (O(table)); the incremental run reads the source change feed and
  * merges a key-pruned batch (O(changes) + O(touched files)) — the
  * decade claim is that the incremental elapsed stays ~flat from 1x
  * to 10x while full resync scales with the table.
  *
  * Usage: runMain graft.tools.ReplicateProbe <dir1x> [<dir10x>]
  * — each dir must hold orders.parquet. Per scale: clustered source
  * built from orders, full first sync, then a FIXED-size DML day
  * (4k contiguous-key updates + 2k deletes + 3k fresh appends) and
  * the incremental replicate that follows it.
  */
object ReplicateProbe {
  private def ms[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ReplicateProbe <dir1x> [<dir10x>]")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    args.toSeq.zip(Seq("1x", "10x")).foreach { case (dir, tag) =>
      def fresh(p: String): String =
        Files.createTempDirectory(p).toFile.toString + "/t"
      val src = fresh("graft_rp_src")
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val n = base.count()
      // clustered source: the daily batch's contiguous key span
      // prunes to its own files, the realistic replication shape
      Snapshots.createTable(spark, src, base.schema,
        properties = Map("cluster.columns" -> "o_orderkey"))
      Snapshots.append(base, src)

      val dst = fresh("graft_rp_dst")
      val (_, tFirst) = ms(
        Snapshots.replicate(spark, src, dst, Seq("o_orderkey")))

      // the fixed-size DML day (absolute, NOT scale-proportional)
      val maxKey = base.agg(max("o_orderkey")).head().getLong(0)
      Snapshots.updateMatching(spark, src,
        (1L to 4000L).toDF("o_orderkey"), Seq("o_orderkey"),
        Seq("o_totalprice" -> (col("o_totalprice") + 1.0)))
      Snapshots.deleteMatching(spark, src,
        (4001L to 6000L).toDF("o_orderkey"), Seq("o_orderkey"))
      Snapshots.append((1L to 3000L)
        .map(i => (maxKey + i, i, i * 1.5))
        .toDF("o_orderkey", "o_custkey", "o_totalprice"), src)

      val (_, tInc) = ms(
        Snapshots.replicate(spark, src, dst, Seq("o_orderkey")))

      // strawman: what the same "follow the source" costs without
      // the feed — a full resync into a fresh replica
      val dstFull = fresh("graft_rp_full")
      val (_, tFull) = ms(
        Snapshots.replicate(spark, src, dstFull, Seq("o_orderkey")))

      println(f"""{"probe":"replicate","scale":"$tag","rows":$n,""" +
        f""""first_sync_ms":$tFirst%.0f,"incremental_ms":$tInc%.0f,""" +
        f""""full_resync_ms":$tFull%.0f}""")
    }
    spark.stop()
  }
}
