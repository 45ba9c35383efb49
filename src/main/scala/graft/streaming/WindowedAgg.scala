package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stateful event-time windowed aggregation — the native Structured
  * Streaming form of the reference's 5-minute bucketing + group-min
  * (lending_data_etl.py:43-57), as an alternative to the per-batch
  * foreachBatch path in [[LendingStream]].
  *
  * Differences are deliberate and documented (SURVEY.md §2.9):
  *   - the reference buckets by *processing* time (utcnow ceil-5min); this
  *     buckets by *event* time, so replays and late data land in their
  *     true bucket;
  *   - the watermark bounds state (and append-mode emission waits for
  *     window close), where the reference's upsert tolerates arbitrarily
  *     late rows;
  *   - `window(ts, d).end` equals the reference's CEILING bucket (F9) for
  *     all non-boundary instants; exact boundary instants differ by one
  *     bucket (floor-semantics of window start) — pinned in the spec.
  *
  * Scale shape: partial aggregation runs map-side per micro-batch; state
  * is keyed (window, keys), pruned at watermark; no unbounded growth.
  */
object WindowedAgg {

  /** Tumbling event-time window aggregate with bounded state.
    *
    * @param agg e.g. `min(col("rate")).as("min_rate")`
    */
  def tumbling(stream: DataFrame, timeCol: String, delay: String,
      windowDuration: String, keys: Seq[String], agg: Column,
      aggs: Column*): DataFrame =
    stream.withWatermark(timeCol, delay)
      .groupBy((window(col(timeCol), windowDuration) +: keys.map(col)): _*)
      .agg(agg, aggs: _*)
      .withColumn("bucket_ts", col("window.end"))
      .drop("window")
}
