package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join with watermarks on both sides — the
  * streaming form of j6's equi-key + time-band join: each funding event
  * joined to lending quotes of the same term within the preceding hour.
  * Both watermarks bound the buffered state; append mode emits a match
  * once both sides' watermarks pass it. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("interval join emits in-band matches only, state bounded by watermarks") {
    implicit val sq = spark.sqlContext
    val quotes = MemoryStream[RawLend]   // (term, rate, observed_at)
    val trades = MemoryStream[RawLend]   // reuse shape: (term, rate=size, observed_at)

    val q = quotes.toDF()
      .selectExpr("term", "rate AS quote_rate", "observed_at AS quote_ts")
      .withWatermark("quote_ts", "2 hours")
    val t = trades.toDF()
      .selectExpr("term", "rate AS trade_size", "observed_at AS trade_ts")
      .withWatermark("trade_ts", "2 hours")

    val joined = t.withColumnRenamed("term", "t_term").join(q,
      expr("t_term = term AND " +
        "quote_ts BETWEEN trade_ts - INTERVAL 1 HOUR AND trade_ts"))
      .select("t_term", "trade_ts", "quote_ts", "quote_rate", "trade_size")

    val query = joined.writeStream
      .format("memory").queryName("ssj_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      quotes.addData(
        RawLend(7, "0.10", ts("2024-01-01 09:30:00")), // in band for 10:00 trade
        RawLend(7, "0.20", ts("2024-01-01 08:30:00")), // out of band (>1h before)
        RawLend(9, "0.30", ts("2024-01-01 09:45:00"))) // wrong term
      trades.addData(RawLend(7, "5", ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      // advance both watermarks far enough to finalize the join window
      quotes.addData(RawLend(7, "0.99", ts("2024-01-02 00:00:00")))
      trades.addData(RawLend(7, "9", ts("2024-01-02 00:00:00")))
      query.processAllAvailable()

      val rows = spark.table("ssj_out")
        .filter(col("trade_ts") === ts("2024-01-01 10:00:00"))
        .select("t_term", "quote_rate").as[(Int, String)].collect().toSeq
      assert(rows == Seq((7, "0.10")),
        s"exactly the in-band same-term quote must match, got $rows")
    } finally query.stop()
  }
}
