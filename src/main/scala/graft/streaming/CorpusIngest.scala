package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus ingest with ONLINE exact dedup: arriving documents
  * are fingerprinted (md5 of normalized text) and deduplicated across
  * micro-batches within a watermark before landing in the corpus table —
  * the streaming form of [[graft.ops.TextDedup.exactByFingerprint]],
  * with the state bound the batch version doesn't need.
  *
  * Sink choice: the NATIVE streaming parquet file sink (append +
  * exactly-once via the sink manifest), not foreachBatch — dedup-then-
  * append needs no merge, so the simplest exactly-once machinery wins.
  * Re-ingesting a duplicate *after* its fingerprint ages out of the
  * watermark state appends a second copy — run the batch
  * `exactByFingerprint` compaction periodically if the corpus must stay
  * globally unique, or widen the watermark to the re-crawl horizon.
  */
object CorpusIngest {

  /** @param docs streaming frame with (doc_id, text, ingest_ts) */
  def start(docs: DataFrame, path: String, checkpoint: String,
      watermarkDelay: String = "24 hours",
      trigger: Trigger = MicroBatch.FiveMinutes): StreamingQuery =
    docs
      .withColumn("fp", graft.functions.TextFns.contentFingerprint(col("text")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("fp"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
