package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming funding-rate ingest (SURVEY.md §2.9): watermarked in-flight
  * dedup on the primary key, then idempotent newest-wins upsert per
  * micro-batch — the streaming form of funding_rates_etl.py's
  * drop_duplicates (:93-95) + ON CONFLICT upsert (:103-108).
  */
object FundingStream {

  /** @param rawStream columns (symbol, funding_time, funding_rate, ...) */
  def start(rawStream: DataFrame, path: String, checkpoint: String,
      watermarkDelay: String = "24 hours",
      trigger: Trigger = MicroBatch.FiveMinutes): StreamingQuery = {
    val deduped = MicroBatch.dedupWithinWatermark(
      rawStream, "funding_time", watermarkDelay, Seq("symbol", "funding_time"))
    MicroBatch.upsertQuery(deduped, path, checkpoint,
      keys = Seq("symbol", "funding_time"),
      version = "funding_time",
      trigger = trigger)
  }
}
