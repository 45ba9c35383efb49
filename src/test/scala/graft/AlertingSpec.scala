package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Alerting

/** Failure-alerting listener: an exceptional query termination produces
  * exactly one alert with the failure message; a clean stop produces
  * none. */
class AlertingSpec extends SparkSpec {
  import spark.implicits._

  test("listener alerts on failed query, stays silent on clean stop") {
    implicit val sq = spark.sqlContext
    val notified = new AtomicInteger(0)
    val listener = Alerting.install(spark, _ => notified.incrementAndGet())
    try {
      // clean stop: no alert
      val okStream = MemoryStream[Int]
      val ok = okStream.toDS().writeStream.format("memory")
        .queryName("alert_ok").outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      okStream.addData(1, 2, 3)
      ok.processAllAvailable()
      ok.stop()

      // failing query: division that throws at runtime (ANSI mode)
      val badStream = MemoryStream[Int]
      val bad = badStream.toDS()
        .select((lit(1) / col("value")).as("inv"))
        .writeStream.format("memory")
        .queryName("alert_bad").outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      badStream.addData(0) // 1/0 → ANSI DIVIDE_BY_ZERO
      intercept[Exception] { bad.processAllAvailable() }

      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (listener.recent.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(listener.recent.size === 1, listener.recent.toString)
      assert(notified.get() === 1)
    } finally spark.streams.removeListener(listener)
  }
}
