package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipelines.Lending

/** Streaming lending ingest (SURVEY.md §3.3 as a live pipeline): the same
  * [[Lending.transform]] the batch path uses, applied per micro-batch via
  * foreachBatch, upserted on (created_at, loan_duration_days) — the
  * reference's per-tick groupBy-min + ON CONFLICT DO UPDATE
  * (lending_data_etl.py:43-45, 76-91).
  *
  * Per-batch (not global) aggregation is deliberate: the reference
  * aggregates each 5-minute payload independently; cross-tick dedup is the
  * upsert key's job.
  */
object LendingStream {

  def start(rawStream: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = MicroBatch.FiveMinutes): StreamingQuery =
    MicroBatch.upsertQuery(rawStream, path, checkpoint,
      keys = Seq("created_at", "loan_duration_days"),
      version = "created_at",
      transform = Lending.transform(_),
      trigger = trigger)
}
