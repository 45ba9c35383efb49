package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.WindowedAgg

/** Stateful windowed aggregation semantics: append mode emits a window
  * exactly once, after the watermark passes its end; late-but-in-delay
  * rows still count; window.end matches the F9 ceiling bucket for
  * non-boundary instants. */
class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling window min with watermark: emit-on-close, late rows counted") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RawLend]
    val windowed = WindowedAgg.tumbling(
      mem.toDF().withColumnRenamed("observed_at", "ts"),
      timeCol = "ts", delay = "10 minutes", windowDuration = "5 minutes",
      keys = Seq("term"), agg = min(col("rate").cast("double")).as("min_rate"))
    val q = windowed.writeStream
      .format("memory").queryName("win_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // window [00:00, 00:05): two quotes, then a late-but-in-delay one
      mem.addData(RawLend(7, "0.4", t("2024-01-01 00:01:00")),
        RawLend(7, "0.3", t("2024-01-01 00:04:00")))
      q.processAllAvailable()
      mem.addData(RawLend(7, "0.2", t("2024-01-01 00:02:00"))) // late, in delay
      q.processAllAvailable()
      // nothing emitted yet — watermark has not passed window end + delay
      assert(spark.table("win_out").isEmpty)

      // an event far past the window advances the watermark → close + emit
      mem.addData(RawLend(7, "0.9", t("2024-01-01 00:30:00")))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("term", "min_rate", "bucket_ts")
        .as[(Int, Double, Timestamp)].collect().toSeq
      assert(rows == Seq((7, 0.2, t("2024-01-01 00:05:00"))))
    } finally q.stop()
  }

  test("session_window stream mirrors batch gaps-and-islands sessions") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[RawLend]
    val sessions = mem.toDF().withColumnRenamed("observed_at", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("term"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("term"), col("session_window.start").as("session_start"),
        col("n_events"))
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // two bursts 2h apart → two sessions; closed by a far-future event
      mem.addData(RawLend(7, "0.1", t("2024-01-01 00:00:00")),
        RawLend(7, "0.2", t("2024-01-01 00:10:00")),
        RawLend(7, "0.3", t("2024-01-01 02:00:00")))
      q.processAllAvailable()
      mem.addData(RawLend(7, "0.4", t("2024-01-01 09:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("term", "session_start", "n_events")
        .as[(Int, Timestamp, Long)].collect().toSeq.sortBy(_._2.getTime)
      assert(rows == Seq(
        (7, t("2024-01-01 00:00:00"), 2L),   // burst 1: two events, one session
        (7, t("2024-01-01 02:00:00"), 1L)))  // burst 2 after the 30-min gap
    } finally q.stop()
  }

  test("window.end equals F9 ceiling bucket for non-boundary instants") {
    import graft.functions.Fns
    val df = Seq(
      Timestamp.valueOf("2024-01-01 00:01:10"),
      Timestamp.valueOf("2024-01-01 00:04:59"),
      Timestamp.valueOf("2024-01-01 23:57:01")).toDF("ts")
    val both = df.select(
      window(col("ts"), "5 minutes").getField("end").as("win_end"),
      Fns.ceilBucket(col("ts"), 300).as("ceil_bucket"))
    assert(both.filter(col("win_end") =!= col("ceil_bucket")).isEmpty)
  }
}
