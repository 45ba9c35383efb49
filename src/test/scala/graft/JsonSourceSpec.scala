package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1-S4 source shape: explicit-schema JSON reads (never inference — at
  * 100 TB schema inference means an extra full pass and nondeterministic
  * widths) with the reference's nested payload paths:
  * `data.ticker[]` (allTickers, active_spot_pairs_etl.py:19) and
  * `data.dataList[]` (funding history, funding_rates_etl.py:36). */
class JsonSourceSpec extends SparkSpec {

  private val payloadSchema = StructType(Seq(
    StructField("code", StringType),
    StructField("data", StructType(Seq(
      StructField("time", LongType),
      StructField("ticker", ArrayType(StructType(Seq(
        StructField("symbol", StringType),
        StructField("last", StringType),
        StructField("volValue", StringType))))))))))

  test("nested API payload → explicit-schema read → explode → typed columns") {
    val dir = Files.createTempDirectory("json-src").toFile.getAbsolutePath
    val payload =
      """{"code":"200000","data":{"time":1704067200000,"ticker":[
        |{"symbol":"BTC-USDT","last":"42000.1","volValue":"123456.7"},
        |{"symbol":"ETH-USDT","last":"2400.5","volValue":"7890.1"},
        |{"symbol":"XBT-BTC","last":"1.0","volValue":"42.0"}]}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(java.nio.file.Path.of(s"$dir/page1.json"), payload)

    val raw = spark.read.schema(payloadSchema).json(dir)
    val tickers = raw
      .select(col("data.time").as("fetched_ms"),
        explode(col("data.ticker")).as("t"))
      .select(
        col("t.symbol").as("symbol"),
        col("t.last").cast("double").as("last_price"),   // F10 cast
        col("t.volValue").cast("double").as("dollar_volume"),
        graft.functions.Fns.epochMillisToTs(col("fetched_ms")).as("fetched_at"))
    val rows = tickers.orderBy("symbol").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("BTC-USDT", "ETH-USDT", "XBT-BTC"))
    assert(rows.head.getDouble(1) === 42000.1)
    assert(rows.head.getTimestamp(3).toInstant.toEpochMilli === 1704067200000L)

    // malformed rows must surface, not silently vanish: explicit schema +
    // columnNameOfCorruptRecord is the contract for quarantining them
    Files.writeString(java.nio.file.Path.of(s"$dir/bad.json"),
      """{"code":"200000","data":{"time":"not-a-long"}}""")
    // (cache first: Spark disallows queries touching ONLY the corrupt
    // column on raw files)
    val withCorrupt = spark.read
      .schema(payloadSchema.add("_corrupt_record", StringType))
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache()
    try {
      assert(withCorrupt.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(withCorrupt.filter(col("_corrupt_record").isNull).count() === 1)
    } finally withCorrupt.unpersist()
  }
}
