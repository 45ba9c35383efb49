package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{FeedSilence, KeyedObs}

/** Event-time feed-silence alerting: a quiet key alerts exactly once when
  * the watermark passes its deadline; a key that resumes in time re-arms
  * and stays silent. */
class FeedSilenceSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("silent key alerts once at its event-time deadline; resumed key does not") {
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[KeyedObs]
    val silenceMs = 30L * 60 * 1000 // 30 min of event time
    val q = FeedSilence.monitor(
      mem.toDS().withWatermark("ts", "0 seconds"), silenceMs)
      .writeStream.format("memory").queryName("silence_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
      def alerts = spark.table("silence_out")
        .as[(String, Timestamp, Long)].collect().toSeq

      // batch 1: A and B both tick
      mem.addData(KeyedObs("A", t("10:00"), 1.0),
        KeyedObs("B", t("10:00"), 1.0))
      q.processAllAvailable()
      assert(alerts.isEmpty) // watermark still at 10:00

      // batch 2: A resumes at 10:50 (re-arms to 11:20); B stays silent
      mem.addData(KeyedObs("A", t("10:50"), 1.0))
      q.processAllAvailable()

      // batch 3: an unrelated key pushes the watermark to 11:00 —
      // past B's 10:30 deadline, NOT past A's re-armed 11:20
      mem.addData(KeyedObs("C", t("11:00"), 1.0))
      q.processAllAvailable()
      // one more tick so the 11:00 watermark takes effect and fires timers
      mem.addData(KeyedObs("C", t("11:01"), 1.0))
      q.processAllAvailable()

      val a = alerts
      assert(a.map(_._1).sorted == Seq("B"), a.toString)
      assert(a.head._2 == t("10:00") && a.head._3 == silenceMs)
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
