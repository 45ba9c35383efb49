package graft

import org.apache.spark.sql.types._

/** Declared schemas for the five reference tables — *written*-schema ground
  * truth per SURVEY.md §1.2 (the reference's declared model drifts from what
  * its jobs actually write; we follow the written shape).
  *
  * Reference: /root/reference/scripts/models.py:14-79 (declared),
  * /root/reference/scripts/funding_stats_etl.py:105-118 (written stats shape).
  */
object Schemas {

  /** kucoin_lending_rates — models.py:14-20. pk (created_at, loan_duration_days). */
  val lendingRates: StructType = StructType(Seq(
    StructField("created_at", TimestampType, nullable = false),
    StructField("daily_interest_rate", DoubleType, nullable = true),
    StructField("loan_duration_days", IntegerType, nullable = false),
    StructField("annualized_interest_rate", DoubleType, nullable = true)))

  /** kucoin_active_futures — models.py:23-43. pk (symbol). */
  val activeFutures: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("first_open_date", TimestampType, nullable = true),
    StructField("base_currency", StringType, nullable = true),
    StructField("quote_currency", StringType, nullable = true),
    StructField("tick_size", DoubleType, nullable = true),
    StructField("initial_margin", DoubleType, nullable = true),
    StructField("maintain_margin", DoubleType, nullable = true),
    StructField("max_risk_limit", IntegerType, nullable = true),
    StructField("min_risk_limit", IntegerType, nullable = true),
    StructField("futures_maker_fee", DoubleType, nullable = true),
    StructField("futures_taker_fee", DoubleType, nullable = true),
    StructField("funding_fee_rate", DoubleType, nullable = true),
    StructField("predicted_funding_fee_rate", DoubleType, nullable = true),
    StructField("open_interest", IntegerType, nullable = true),
    StructField("futures_dollar_volume_24h", DoubleType, nullable = true),
    StructField("futures_unit_volume_24h", DoubleType, nullable = true),
    StructField("time_to_next_funding_rate", StringType, nullable = true),
    StructField("max_leverage", IntegerType, nullable = true)))

  /** kucoin_active_spot_pairs — models.py:46-55. pk (symbol). */
  val activeSpotPairs: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("spot_unit_volume24h", DoubleType, nullable = true),
    StructField("spot_dollar_volume24h", DoubleType, nullable = true),
    StructField("spot_taker_fee", DoubleType, nullable = true),
    StructField("spot_maker_fee", DoubleType, nullable = true),
    StructField("base_currency", StringType, nullable = true),
    StructField("quote_currency", StringType, nullable = true)))

  /** kucoin_funding_rates — models.py:58-64. pk (symbol, funding_time). */
  val fundingRates: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("funding_period", StringType, nullable = true),
    StructField("funding_time", TimestampType, nullable = false),
    StructField("funding_rate", DoubleType, nullable = true)))

  /** kucoin_funding_stats — written shape, funding_stats_etl.py:105-118. */
  val fundingStats: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("dollar_volume_24h", DoubleType, nullable = true),
    StructField("predicted_funding_rate", DoubleType, nullable = true),
    StructField("funding_8h", DoubleType, nullable = true),
    StructField("funding_24h", DoubleType, nullable = true),
    StructField("funding_3d", DoubleType, nullable = true),
    StructField("funding_7d", DoubleType, nullable = true),
    StructField("funding_14d", DoubleType, nullable = true),
    StructField("funding_30d", DoubleType, nullable = true),
    StructField("funding_90d", DoubleType, nullable = true)))
}
