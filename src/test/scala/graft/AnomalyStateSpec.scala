package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{AnomalyState, KeyedObs}

/** Streaming z-score alerting: quiet baselines emit nothing, a spike
  * alerts with the hand-computed z, the count gate holds, and
  * out-of-order stragglers score against their own past only. */
class AnomalyStateSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("spike alerts once with the hand-computed z; quiet path is silent") {
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[KeyedObs]
    val q = AnomalyState.detect(mem.toDS(), n = 6, minObs = 4,
      threshold = 2.0)
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      def alerts = spark.table("anomaly_out")
        .as[(String, Timestamp, Double, Double, Long)].collect().toSeq

      // flat baseline: count gate passes at the 4th obs, but std = 0 →
      // no alert ever
      mem.addData((0 to 4).map(h => KeyedObs("BTC", t(h), 10.0)): _*)
      q.processAllAvailable()
      assert(alerts.isEmpty)

      // spike: window [50, 10×5] → mean 100/6, std 16.3299, z ≈ 2.0412
      mem.addData(KeyedObs("BTC", t(5), 50.0))
      q.processAllAvailable()
      val a = alerts
      assert(a.size == 1)
      assert(a.head._1 == "BTC" && a.head._3 == 50.0 && a.head._5 == 6L)
      assert(math.abs(a.head._4 - 2.0412) < 1e-3)

      // out-of-order straggler from the flat era: its frame is its own
      // past (all 10.0, std 0) — the later spike must not contaminate it
      mem.addData(KeyedObs("BTC", Timestamp.valueOf("2024-01-01 04:30:00"),
        10.0))
      q.processAllAvailable()
      assert(alerts.size == 1)

      // an independent quiet key alerts nothing
      mem.addData((0 to 5).map(h => KeyedObs("ETH", t(h), 5.0)): _*)
      q.processAllAvailable()
      assert(alerts.size == 1)
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
