package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Snapshots

/** Decade slope of the two SQL MERGE shapes, through the real catalog
  * path:
  *
  *   - POINT merge (conditional matched actions, no BY SOURCE): the
  *     classification join stays INNER-ish and the commit's rewrite is
  *     footprint-pruned to the source keys' files — cost should be
  *     ~flat across a decade of target growth (DmlScaleProbe shows the
  *     file counts; this probe shows the SQL-path wall).
  *   - FULL MATRIX merge (WHEN NOT MATCHED BY SOURCE present): every
  *     target row must be classified, so the join is FULL OUTER and
  *     pruning is forfeited by the semantics — cost should track a
  *     full read+rewrite of the target (the intrinsic lower bound),
  *     NOT something worse (no extra shuffles, no repeated scans).
  *
  * Each scale reports, min-of-2: point-merge wall, matrix-merge wall,
  * and the full target rewrite lower bound (read + stage every file,
  * via a whole-table content-identical OPTIMIZE on a clone).
  *
  * Usage: runMain graft.tools.MergeMatrixProbe [dir1x] [dir10x]
  */
object MergeMatrixProbe {
  private def ms[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val dir1 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dir10 = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = Files.createTempDirectory("graft_mmx_wh").toFile.toString
    spark.conf.set("spark.sql.catalog.gmx", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmx.warehouse", wh)

    Seq(dir1 -> "1x", dir10 -> "10x").foreach { case (dir, tag) =>
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val maxKey = base.agg(max("o_orderkey")).head().getLong(0)
      val n = base.count()

      def fresh(name: String): String = {
        val t = s"$wh/default/${name}_$tag"
        Snapshots.append(base.repartitionByRange(32, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"), t)
        s"gmx.default.${name}_$tag"
      }

      // narrow source: 200 keys in a tight range, half new keys
      spark.range(maxKey / 4 - 100, maxKey / 4 + 100)
        .select((col("id") * 4).as("o_orderkey"),
          lit(1L).as("o_custkey"), lit(9.99).as("o_totalprice"))
        .createOrReplaceTempView("mmx_src_narrow")
      // broad source: ~half the target's keys (sync-shaped)
      base.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .createOrReplaceTempView("mmx_src_broad")

      // pre-build the tables so the timed body is the merge alone
      def minOf2(body: String => Unit): Double = (1 to 2).map { i =>
        val t = fresh(s"t$i${System.nanoTime()}")
        ms(body(t))
      }.min

      val tPoint = minOf2 { t =>
        spark.sql(s"""MERGE INTO $t t USING mmx_src_narrow s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND s.o_totalprice > 0 THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
      }
      val tMatrix = minOf2 { t =>
        spark.sql(s"""MERGE INTO $t t USING mmx_src_broad s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND t.o_custkey % 100 = 0
            THEN DELETE""")
      }
      // lower bound: read + restage every target file (what any
      // engine must pay once pruning is semantically forfeited)
      val tRewrite = minOf2 { t =>
        val dir = s"$wh/default/${t.split('.').last}"
        Snapshots.compact(spark, dir, 32,
          Snapshots.currentVersion(spark, dir).get)
      }

      println(f"$tag%-4s rows=$n%-9d point-merge ${tPoint / 1000}%.2fs  " +
        f"matrix-merge ${tMatrix / 1000}%.2fs  " +
        f"full-rewrite-bound ${tRewrite / 1000}%.2fs")
    }
    spark.stop()
  }
}
