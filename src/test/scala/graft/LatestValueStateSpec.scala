package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{KeyedObs, LatestValueState}

/** mapGroupsWithState latest-value tracker: newest-ts wins across
  * batches, out-of-order and duplicate deliveries absorbed, per-key
  * observation counter accumulates. */
class LatestValueStateSpec extends SparkSpec {
  import spark.implicits._

  test("stateful latest-per-key across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[KeyedObs]
    val q = LatestValueState.track(mem.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        KeyedObs("BTC", t("2024-01-01 08:00:00"), 0.0001),
        KeyedObs("BTC", t("2024-01-01 16:00:00"), 0.0003),
        KeyedObs("ETH", t("2024-01-01 08:00:00"), 0.0002))
      q.processAllAvailable()
      // batch 2: an OLDER row for BTC must not displace the newest
      mem.addData(KeyedObs("BTC", t("2024-01-01 00:00:00"), 0.0009))
      q.processAllAvailable()
      // batch 3: genuinely newer row wins
      mem.addData(KeyedObs("ETH", t("2024-01-02 00:00:00"), 0.0007))
      q.processAllAvailable()

      // memory sink in update mode appends each emission; last per key wins
      val latest = spark.table("latest_out")
        .as[(String, Timestamp, Double, Long)].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.last }
      assert(latest("BTC")._3 === 0.0003) // newest kept, stale ignored
      assert(latest("BTC")._2 === t("2024-01-01 16:00:00"))
      assert(latest("BTC")._4 === 3L)     // saw 3 observations
      assert(latest("ETH")._3 === 0.0007)
      assert(latest("ETH")._4 === 2L)
    } finally q.stop()
  }
}
