package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{KeyedObs, TrailingState}

/** transformWithState trailing-mean: bounded O(N)-per-key state, count
  * gate matches the batch kernel, out-of-order arrivals resolved by
  * event time. */
class TrailingStateSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("incremental trailing mean across batches with count gate") {
    implicit val sq = spark.sqlContext
    // transformWithState needs the RocksDB provider (multiple column
    // families); the default HDFS-backed store does not support it
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[KeyedObs]
    val q = TrailingState.track(mem.toDS(), n = 3)
      .writeStream.format("memory").queryName("trail_out")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      def latestRows = spark.table("trail_out")
        .as[(String, Double, Option[Double], Long)].collect()
        .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._4) }

      mem.addData(KeyedObs("BTC", t(0), 2.0), KeyedObs("BTC", t(8), 4.0))
      q.processAllAvailable()
      val r1 = latestRows
      assert(r1("BTC")._2 === 4.0)       // latest
      assert(r1("BTC")._3.isEmpty)       // 2 < 3 → gated
      assert(r1("BTC")._4 === 2L)

      // out-of-order arrival (older than the latest) still counts
      mem.addData(KeyedObs("BTC", t(4), 6.0))
      q.processAllAvailable()
      val r2 = latestRows
      assert(r2("BTC")._2 === 4.0)       // 08:00 still newest
      assert(r2("BTC")._3 === Some(4.0)) // mean(2,6,4) = 4
      assert(r2("BTC")._4 === 3L)

      // a 4th observation evicts the oldest from state (bounded O(N))
      mem.addData(KeyedObs("BTC", t(16), 8.0))
      q.processAllAvailable()
      val r3 = latestRows
      assert(r3("BTC")._2 === 8.0)
      assert(r3("BTC")._3 === Some(6.0)) // mean of newest 3: 8,4,6
      assert(r3("BTC")._4 === 4L)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
