package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.FundingStatsStream
import graft.ops.Stats

/** Live derived-table maintenance: each micro-batch upserts funding rows
  * then rebuilds the trailing-stats table — latest value and count-gated
  * horizons track the growing history across ticks. */
class FundingStatsStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stats table tracks the stream across micro-batches") {
    implicit val sq = spark.sqlContext
    val base = Files.createTempDirectory("fss").toFile.getAbsolutePath
    val mem = MemoryStream[RawFunding]
    val q = FundingStatsStream.start(mem.toDF(),
      s"$base/funding", s"$base/stats", s"$base/ckpt",
      horizons = Seq(Stats.Horizon("h3", 3)),
      trigger = Trigger.ProcessingTime(0))
    try {
      def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      mem.addData(RawFunding("BTCUSDTM", t(0), 0.0001),
        RawFunding("BTCUSDTM", t(8), 0.0002))
      q.processAllAvailable()
      val s1 = spark.read.parquet(s"$base/stats")
        .select("symbol", "funding_8h", "h3")
        .as[(String, Double, Option[Double])].collect().toSeq
      // 2 observations: h3 gated to null, latest = 08:00 rate
      assert(s1 == Seq(("BTCUSDTM", 0.0002, None)))

      mem.addData(RawFunding("BTCUSDTM", t(16), 0.0006))
      q.processAllAvailable()
      val s2 = spark.read.parquet(s"$base/stats")
        .select("symbol", "funding_8h", "h3")
        .as[(String, Double, Option[Double])].collect().toSeq
      // 3 observations: gate opens, mean of the 3 newest
      assert(s2.head._1 == "BTCUSDTM")
      assert(s2.head._2 === 0.0006)
      assert(s2.head._3.exists(m => math.abs(m - 0.0003) < 1e-12))
    } finally q.stop()
  }
}
