package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{FundingStream, LendingStream}

final case class RawLend(term: Int, rate: String, observed_at: Timestamp)
final case class RawFunding(symbol: String, funding_time: Timestamp,
    funding_rate: Double)

/** Micro-batch pipeline tests over MemoryStream: per-tick aggregation +
  * upsert semantics (SURVEY.md §2.9) — re-delivered rows update rather
  * than duplicate; within-batch duplicates collapse. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("lending stream: per-batch group-min, same-bucket re-run upserts") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RawLend]
    val path = tmp("lend-sink")
    val q = LendingStream.start(mem.toDF(), s"$path/t", s"$path/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      val t1 = Timestamp.valueOf("2024-01-01 00:01:10")
      // batch 1: two quotes for term 7 → min survives
      mem.addData(RawLend(7, "0.400000", t1), RawLend(7, "0.300000", t1))
      q.processAllAvailable()
      val after1 = spark.read.parquet(s"$path/t")
        .as[(Timestamp, Double, Int, Double)].collect().toSeq
      assert(after1 == Seq((Timestamp.valueOf("2024-01-01 00:05:00"),
        0.3, 7, 0.3 * 365.0)))

      // batch 2: same 5-min bucket, lower quote → upsert replaces the row
      mem.addData(RawLend(7, "0.200000", Timestamp.valueOf("2024-01-01 00:02:00")))
      q.processAllAvailable()
      val after2 = spark.read.parquet(s"$path/t")
        .as[(Timestamp, Double, Int, Double)].collect().toSeq
      assert(after2 == Seq((Timestamp.valueOf("2024-01-01 00:05:00"),
        0.2, 7, 0.2 * 365.0)))
    } finally q.stop()
  }

  test("funding stream: in-batch duplicates collapse; re-delivery updates") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RawFunding]
    val path = tmp("fund-sink")
    val q = FundingStream.start(mem.toDF(), s"$path/t", s"$path/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      val t1 = Timestamp.valueOf("2024-01-01 08:00:00")
      mem.addData(
        RawFunding("BTCUSDTM", t1, 0.0001),
        RawFunding("BTCUSDTM", t1, 0.0001), // in-batch duplicate
        RawFunding("ETHUSDTM", t1, 0.0002))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$path/t").count() == 2)

      // late re-delivery of the same pkey → still 2 rows (upsert, no dup)
      mem.addData(RawFunding("BTCUSDTM", t1, 0.0001))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$path/t").orderBy("symbol")
        .as[RawFunding].collect().toSeq
      assert(rows.map(_.symbol) == Seq("BTCUSDTM", "ETHUSDTM"))
    } finally q.stop()
  }
}
