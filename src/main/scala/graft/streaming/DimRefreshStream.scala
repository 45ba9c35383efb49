package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Sinks

/** Streaming dimension refresh (SURVEY.md S8 in streaming form): each
  * micro-batch REPLACES the dimension table — the reference's per-tick
  * `TRUNCATE TABLE` + reload (active_spot_pairs_etl.py:64-75) driven by
  * arriving [[JsonApiSource]] payloads instead of an Airflow task.
  * Newest poll wins wholesale; there is no merge, because the upstream
  * API returns the complete current universe every time.
  */
object DimRefreshStream {

  def start(cleanFeed: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = MicroBatch.FiveMinutes): StreamingQuery =
    cleanFeed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty batch means "no poll arrived this tick" — keep the
        // previous universe rather than truncating the dimension away
        if (!batch.isEmpty) Sinks.overwriteParquet(batch, path)
      }
      .start()
}
