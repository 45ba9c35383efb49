package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Fns

/** S1–S4 live-source parity: file-based Structured Streaming reads of
  * arriving REST JSON response payloads, with the reference's nested
  * paths made explicit:
  *
  *   - `data.ticker[]`   — allTickers responses
  *     (active_spot_pairs_etl.py:17-20)
  *   - `data.dataList[]` — per-contract funding-rate history
  *     (funding_rates_etl.py:33-36)
  *
  * The HTTP poller itself stays outside the engine (a fetcher drops each
  * response body into the watched directory — the same decoupling the
  * reference gets from Airflow task boundaries); everything from the
  * bytes onward is this streaming source. Schemas are explicit, never
  * inferred: at scale, inference is an extra full pass with
  * nondeterministic widths. Malformed or drifted payloads land in
  * `_corrupt_record`: the clean streams filter them OUT (they would
  * otherwise surface as all-null rows), and [[corruptTickers]] /
  * [[corruptFundingRates]] expose the quarantine side — attach it to its
  * own sink (separate checkpoint) so bad polls are visible, not silently
  * dropped.
  *
  * Each stream applies the reference's cleanse inline (keep-list,
  * snake_case renames, string→double casts, base/quote split, epoch→ts)
  * so downstream pipelines ([[FundingStream]], [[LendingStream]],
  * dimension refresh) consume the same typed shape they already take
  * from batch fixtures.
  */
object JsonApiSource {

  /** allTickers response: `{code, data: {time, ticker: [...]}}`. */
  val allTickersSchema: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("data", StructType(Seq(
      StructField("time", LongType),
      StructField("ticker", ArrayType(StructType(Seq(
        StructField("symbol", StringType),
        StructField("vol", StringType),
        StructField("volValue", StringType),
        StructField("takerFeeRate", StringType),
        StructField("makerFeeRate", StringType))))))))))

  /** funding-rates response: `{code, data: {dataList: [...], hasMore}}`. */
  val fundingRatesSchema: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("data", StructType(Seq(
      StructField("dataList", ArrayType(StructType(Seq(
        StructField("symbol", StringType),
        StructField("granularity", LongType),
        StructField("timePoint", LongType),
        StructField("value", DoubleType))))),
      StructField("hasMore", BooleanType))))))

  private val Corrupt = "_corrupt_record"

  /** Explicit-schema streaming JSON read with corrupt-record capture. */
  private def readRaw(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(schema.add(Corrupt, StringType))
      .option("columnNameOfCorruptRecord", Corrupt)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Batch replay of the same explicit-schema + corrupt-record parse the
    * streaming sources run — one code path for the parse semantics, so
    * the batch oracle (s14) checks exactly what the streams do. Returns
    * the raw frame: schema fields plus `_corrupt_record` (null for clean
    * rows, the raw payload line otherwise).
    *
    * The frame is re-rooted on its own RDD, deliberately: Spark decides
    * corruptness against the scan's REQUIRED schema, so a downstream
    * projection that drops payload fields (a bare `count()` is enough)
    * would silently reclassify type-drifted records as clean — the
    * quarantine's row SET would depend on which columns the reader asked
    * for. The barrier pins the parse at the full schema; the cost (no
    * column pruning) is the semantic requirement here — you must parse
    * everything to know a record is clean. */
  def readFundingBatch(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .schema(fundingRatesSchema.add(Corrupt, StringType))
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(dir)
    spark.createDataFrame(raw.rdd, raw.schema)
  }

  /** Quarantine stream: the raw text of every payload line the schema
    * could not fully parse, plus whatever DID parse (`code` and the
    * payload struct re-serialized as JSON) for triage — a type-drifted
    * record keeps its envelope, a truncated line keeps nothing.
    *
    * `parsed_payload` is not just triage sugar: corruptness is decided
    * against the scan's required schema, so the quarantine projection
    * must reference the FULL payload struct or records whose only defect
    * is a drifted inner field would not be flagged at all (their bad
    * field is never parsed). A sink that keeps these columns keeps the
    * full-schema semantics; do not project them away upstream of the
    * sink. Runs as its own query/checkpoint beside the clean one. */
  def corruptTickers(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    readRaw(spark, dir, allTickersSchema, maxFilesPerTrigger)
      .filter(col(Corrupt).isNotNull)
      .select(col("code"), to_json(col("data")).as("parsed_payload"),
        col(Corrupt))

  /** Quarantine stream for funding-rate payloads — see [[corruptTickers]]. */
  def corruptFundingRates(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    readRaw(spark, dir, fundingRatesSchema, maxFilesPerTrigger)
      .filter(col(Corrupt).isNotNull)
      .select(col("code"), to_json(col("data")).as("parsed_payload"),
        col(Corrupt))

  /** Streaming spot-pairs source: arriving allTickers payloads →
    * exploded, cleansed USDT tickers (active_spot_pairs_etl.py:23-60's
    * keep-list / snake_case / base-quote split / USDT filter). */
  def tickersStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    readRaw(spark, dir, allTickersSchema, maxFilesPerTrigger)
      .filter(col(Corrupt).isNull)
      .select(col("data.time").as("fetched_ms"),
        explode(col("data.ticker")).as("t"))
      .select(
        col("t.symbol").as("symbol"),
        col("t.vol").cast("double").as("spot_unit_volume24h"),
        col("t.volValue").cast("double").as("spot_dollar_volume24h"),
        col("t.takerFeeRate").cast("double").as("spot_taker_fee_rate"),
        col("t.makerFeeRate").cast("double").as("spot_maker_fee_rate"),
        split(col("t.symbol"), "-").getItem(0).as("base_currency"),
        split(col("t.symbol"), "-").getItem(1).as("quote_currency"),
        Fns.epochMillisToTs(col("fetched_ms")).as("fetched_at"))
      .filter(col("quote_currency") === "USDT")

  /** Streaming funding-rate source: arriving funding-rates payloads →
    * exploded, renamed rows typed for [[FundingStream]]
    * (funding_rates_etl.py:73-97's rename + epoch→timestamp cleanse;
    * the in-batch drop_duplicates lives downstream in
    * [[MicroBatch.dedupWithinWatermark]]). */
  def fundingStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    readRaw(spark, dir, fundingRatesSchema, maxFilesPerTrigger)
      .filter(col(Corrupt).isNull)
      .select(explode(col("data.dataList")).as("f"))
      .select(
        col("f.symbol").as("symbol"),
        Fns.epochMillisToTs(col("f.timePoint")).as("funding_time"),
        col("f.value").as("funding_rate"),
        (col("f.granularity") / 1000L).cast("long").as("funding_period_s"))
}
