package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
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

  test("corpus ingest dedups exact copies across micro-batches before landing") {
    import graft.streaming.CorpusIngest
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val path = tmp("corpus-sink")
    val q = CorpusIngest.start(
      mem.toDF().toDF("doc_id", "text", "ingest_ts"),
      s"$path/t", s"$path/ckpt", trigger = Trigger.ProcessingTime(0))
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      mem.addData((1L, "a unique document", t0), (2L, "a unique document", t0))
      q.processAllAvailable()
      // in-batch exact copy collapsed
      assert(spark.read.parquet(s"$path/t").count() == 1)
      // cross-batch re-crawl of the same text within the watermark: dropped
      mem.addData((3L, "a unique document", Timestamp.valueOf("2024-01-01 01:00:00")),
        (4L, "different text entirely", Timestamp.valueOf("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val docs = spark.read.parquet(s"$path/t").select("doc_id")
        .as[Long].collect().toSet
      assert(docs.size == 2 && docs.contains(4L))
    } finally q.stop()
  }

  // ---- S1–S4 live-source parity: arriving REST JSON files ---------------

  test("funding JSON arrivals stream end-to-end into the upsert sink") {
    import graft.streaming.JsonApiSource
    val src = tmp("json-arrivals")
    val sink = tmp("json-sink")
    def drop(name: String, body: String): Unit =
      Files.writeString(java.nio.file.Path.of(s"$src/$name"),
        body.replace("\n", ""))

    drop("t0.json",
      """{"code":"200000","data":{"dataList":[
        |{"symbol":"XBTUSDTM","granularity":28800000,"timePoint":1704096000000,"value":0.0001},
        |{"symbol":"XBTUSDTM","granularity":28800000,"timePoint":1704096000000,"value":0.0001},
        |{"symbol":"ETHUSDTM","granularity":28800000,"timePoint":1704096000000,"value":0.0002}],
        |"hasMore":false}}""".stripMargin)
    val q = FundingStream.start(
      JsonApiSource.fundingStream(spark, src), s"$sink/t", s"$sink/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      // in-batch duplicate collapsed; nested path + epoch→ts cleanse applied
      val after1 = spark.read.parquet(s"$sink/t")
        .orderBy("symbol")
        .as[(String, Timestamp, Double, Long)].collect().toSeq
      assert(after1 == Seq(
        ("ETHUSDTM", Timestamp.from(java.time.Instant.ofEpochMilli(1704096000000L)), 0.0002, 28800L),
        ("XBTUSDTM", Timestamp.from(java.time.Instant.ofEpochMilli(1704096000000L)), 0.0001, 28800L)))

      // next poll arrives as a new file: one re-delivered pkey (dropped by
      // the stateful dedup), one genuinely new funding tick (upserted)
      drop("t1.json",
        """{"code":"200000","data":{"dataList":[
          |{"symbol":"XBTUSDTM","granularity":28800000,"timePoint":1704096000000,"value":0.0001},
          |{"symbol":"XBTUSDTM","granularity":28800000,"timePoint":1704124800000,"value":0.0003}],
          |"hasMore":false}}""".stripMargin)
      q.processAllAvailable()
      val after2 = spark.read.parquet(s"$sink/t")
      assert(after2.count() == 3)
      assert(after2.filter(col("funding_rate") === 0.0003).count() == 1)
    } finally q.stop()
  }

  test("streaming dimension refresh: each arriving poll replaces the table") {
    import graft.streaming.{DimRefreshStream, JsonApiSource}
    val src = tmp("dim-arrivals")
    val sink = tmp("dim-sink")
    def poll(name: String, syms: (String, String)*): Unit =
      Files.writeString(java.nio.file.Path.of(s"$src/$name"),
        s"""{"code":"200000","data":{"time":1704067200000,"ticker":[""" +
          syms.map { case (sym, vol) =>
            s"""{"symbol":"$sym","vol":"$vol","volValue":"1.0","takerFeeRate":"0.001","makerFeeRate":"0.001"}"""
          }.mkString(",") + "]}}")

    poll("p0.json", "BTC-USDT" -> "10.0", "ETH-USDT" -> "5.0")
    val q = DimRefreshStream.start(
      JsonApiSource.tickersStream(spark, src), s"$sink/t", s"$sink/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$sink/t").count() == 2)
      // next poll: ETH delisted, SOL appears — table is REPLACED, not
      // merged (truncate-reload semantics)
      poll("p1.json", "BTC-USDT" -> "11.0", "SOL-USDT" -> "3.0")
      q.processAllAvailable()
      val out = spark.read.parquet(s"$sink/t").orderBy("symbol")
        .select("symbol", "spot_unit_volume24h")
        .as[(String, Double)].collect().toSeq
      assert(out == Seq("BTC-USDT" -> 11.0, "SOL-USDT" -> 3.0))
    } finally q.stop()
  }

  test("malformed JSON payloads land in the quarantine stream, not silently dropped") {
    import graft.streaming.JsonApiSource
    val src = tmp("bad-arrivals")
    Files.writeString(java.nio.file.Path.of(s"$src/good.json"),
      """{"code":"200000","data":{"dataList":[{"symbol":"XBTUSDTM","granularity":28800000,"timePoint":1704096000000,"value":0.0001}],"hasMore":false}}""")
    Files.writeString(java.nio.file.Path.of(s"$src/truncated.json"),
      """{"code":"200000","data":{"dataList":[{"symbol":"XBTUSDTM","granu""")
    // type DRIFT (timePoint carries a string): valid JSON, bad schema —
    // must be quarantined too, and its parsed envelope must survive for
    // triage. This is the class a (code, _corrupt_record)-only
    // projection would silently misclassify as clean, because the
    // drifted field would never be parsed at all.
    Files.writeString(java.nio.file.Path.of(s"$src/drift.json"),
      """{"code":"200000","data":{"dataList":[{"symbol":"ETHUSDTM","granularity":28800000,"timePoint":"oops","value":0.0002}],"hasMore":false}}""")
    val clean = JsonApiSource.fundingStream(spark, src)
      .writeStream.format("memory").queryName("funding_clean")
      .trigger(Trigger.ProcessingTime(0)).outputMode("append").start()
    val bad = JsonApiSource.corruptFundingRates(spark, src)
      .writeStream.format("memory").queryName("funding_quarantine")
      .trigger(Trigger.ProcessingTime(0)).outputMode("append").start()
    try {
      clean.processAllAvailable()
      bad.processAllAvailable()
      assert(spark.table("funding_clean").count() == 1)
      val quarantined = spark.table("funding_quarantine")
        .select("code", "parsed_payload", "_corrupt_record")
        .collect().sortBy(_.getString(2))
      assert(quarantined.length == 2)
      val Array(drift, truncated) = quarantined
      assert(truncated.getString(2).contains("granu"))
      assert(truncated.isNullAt(0), "nothing parses for a truncated line")
      assert(drift.getString(2).contains("\"oops\""))
      assert(drift.getString(0) == "200000",
        "a drifted record keeps its parsed envelope")
      assert(drift.getString(1).contains("ETHUSDTM"),
        "the fields that DID parse surface for triage")
    } finally { clean.stop(); bad.stop() }
  }

  test("allTickers JSON arrivals stream through the spot-pairs cleanse") {
    import graft.streaming.JsonApiSource
    val src = tmp("ticker-arrivals")
    Files.writeString(java.nio.file.Path.of(s"$src/poll0.json"),
      ("""{"code":"200000","data":{"time":1704067200000,"ticker":[
        |{"symbol":"BTC-USDT","vol":"10.5","volValue":"441000.2","takerFeeRate":"0.001","makerFeeRate":"0.001"},
        |{"symbol":"ETH-BTC","vol":"3.0","volValue":"126.0","takerFeeRate":"0.001","makerFeeRate":"0.001"}]}}"""
        ).stripMargin.replace("\n", ""))
    val q = JsonApiSource.tickersStream(spark, src)
      .writeStream.format("memory").queryName("spot_pairs_live")
      .trigger(Trigger.ProcessingTime(0)).outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("spot_pairs_live").collect()
      // non-USDT quote filtered out; keep-list + casts + split applied
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getString(0) == "BTC-USDT")
      assert(r.getDouble(1) == 10.5 && r.getDouble(2) == 441000.2)
      assert(r.getString(5) == "BTC" && r.getString(6) == "USDT")
      assert(r.getTimestamp(7).toInstant.toEpochMilli == 1704067200000L)
    } finally q.stop()
  }
}
