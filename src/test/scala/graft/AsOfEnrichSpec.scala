package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{AsOfEnrich, AsOfEnriched, AsOfProbe, KeyedObs}

/** Streaming as-of enrichment: a probe pairs with the LATEST reference
  * at-or-before its event time, decided only once the watermark passes
  * the probe — so a reference that arrives LATE in processing time (but
  * within the lateness bound) still wins over an earlier-arriving,
  * older one. This is the event-time correctness gap between an as-of
  * join and "enrich with current state". */
class AsOfEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("late reference arrival is respected; probe finalizes on watermark") {
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[AsOfProbe]
    val refs = MemoryStream[KeyedObs]
    val q = AsOfEnrich.enrich(probes.toDS(), refs.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: the probe and an OLD reference arrive; watermark still 0
      probes.addData(AsOfProbe("BTC", t("2024-01-01 10:00:00"), 1.0))
      refs.addData(KeyedObs("BTC", t("2024-01-01 09:40:00"), 5.0))
      q.processAllAvailable()
      assert(spark.table("asof_out").isEmpty,
        "probe must not finalize before the watermark passes it")

      // batch 2: a LATE reference (event time 09:55 < probe, arrives
      // after it; watermark is 09:50, so it is within lateness) plus a
      // newer reference that advances the watermark past the probe
      refs.addData(
        KeyedObs("BTC", t("2024-01-01 09:55:00"), 7.0),
        KeyedObs("BTC", t("2024-01-01 10:30:00"), 9.0))
      q.processAllAvailable()

      // batches 3-4: traffic on ANOTHER key advances the watermark to
      // 10:20 > probe; the BTC probe must flush via its event-time
      // timeout without any further BTC rows
      refs.addData(KeyedObs("ETH", t("2024-01-01 11:00:00"), 0.0))
      q.processAllAvailable()
      refs.addData(KeyedObs("ETH", t("2024-01-01 11:10:00"), 0.0))
      q.processAllAvailable()

      val rows = spark.table("asof_out").as[AsOfEnriched].collect().toSeq
      assert(rows.map(_.key) == Seq("BTC"))
      val r = rows.head
      assert(r.ts == t("2024-01-01 10:00:00") && r.payload == 1.0)
      // the LATE 09:55 reference wins — not the early-arriving 09:40
      // one, and not the 10:30 one after the probe
      assert(r.asof_time.contains(t("2024-01-01 09:55:00")) &&
        r.asof_value.contains(7.0),
        s"expected the late 09:55 reference to win, got $r")
    } finally q.stop()
  }

  test("probe with no preceding reference emits None") {
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[AsOfProbe]
    val refs = MemoryStream[KeyedObs]
    val q = AsOfEnrich.enrich(probes.toDS(), refs.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("asof_none_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      probes.addData(AsOfProbe("SOL", t("2024-01-01 08:00:00"), 2.0))
      // reference exists only AFTER the probe
      refs.addData(KeyedObs("SOL", t("2024-01-01 08:05:00"), 3.0))
      q.processAllAvailable()
      refs.addData(KeyedObs("SOL", t("2024-01-01 09:00:00"), 4.0))
      q.processAllAvailable()
      refs.addData(KeyedObs("SOL", t("2024-01-01 09:30:00"), 4.0))
      q.processAllAvailable()

      val rows = spark.table("asof_none_out").as[AsOfEnriched]
        .collect().toSeq
      assert(rows.size == 1)
      assert(rows.head.asof_time.isEmpty && rows.head.asof_value.isEmpty,
        s"no reference at-or-before the probe → None, got ${rows.head}")
    } finally q.stop()
  }
}
