package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Golden tests for the trailing-window kernel — hand-computed horizons,
  * including the `count < N` null gate the reference requires
  * (funding_stats_etl.py:86,96-97) and which a naive window frame would
  * silently violate (Spark frames truncate at the partition edge and would
  * happily average fewer than N rows).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("trailing means with count gate and latest value") {
    // A: 5 observations (values 10,20,30,40,50 oldest→newest)
    // B: 2 observations (values 7, 9)
    val df = (
      (1 to 5).map(i => ("A", ts(i), i * 10.0)) ++
        Seq(("B", ts(1), 7.0), ("B", ts(2), 9.0))
      ).toDF("symbol", "funding_time", "rate")

    val out = Stats.trailing(df, "symbol", "funding_time",
      col("rate").cast("decimal(18,2)"),
      Seq(Stats.Horizon("m3", 3), Stats.Horizon("m9", 9)),
      latestCol = "latest")
      .orderBy("symbol")
      .collect()

    val a = out(0)
    assert(a.getAs[String]("symbol") == "A")
    assert(a.getAs[Double]("latest") == 50.0)
    // 3 newest of A = 50,40,30 → mean 40
    assert(a.getAs[Double]("m3") == 40.0)
    // A has 5 < 9 observations → gated null, NOT mean-of-5
    assert(a.isNullAt(a.fieldIndex("m9")))

    val b = out(1)
    assert(b.getAs[Double]("latest") == 9.0)
    assert(b.isNullAt(b.fieldIndex("m3"))) // 2 < 3 → null
    assert(b.isNullAt(b.fieldIndex("m9")))
  }

  test("the 270-session horizon opens at exactly 270 observations") {
    def at(i: Int) = new Timestamp(1704067200000L + i * 60000L)
    // X: exactly 270 observations (i as value), Y: 269
    val df = (
      (1 to 270).map(i => ("X", at(i), i.toDouble)) ++
        (1 to 269).map(i => ("Y", at(i), 1.0))
      ).toDF("symbol", "funding_time", "rate")
    val out = Stats.trailing(df, "symbol", "funding_time",
      col("rate").cast("decimal(18,2)"), Stats.referenceHorizons)
      .orderBy("symbol").collect()

    val x = out(0)
    // mean of ALL 270 values 1..270 = 135.5; newest-3 = 269
    assert(x.getAs[Double]("funding_90d") == 135.5)
    assert(x.getAs[Double]("funding_24h") == 269.0)
    val y = out(1)
    assert(y.isNullAt(y.fieldIndex("funding_90d"))) // 269 < 270 → gated
    assert(y.getAs[Double]("funding_30d") == 1.0)   // 269 ≥ 90 → open
  }

  test("trailing is deterministic under repartitioning") {
    val df = (1 to 100).map(i => (s"S${i % 7}", ts(i % 60), i * 1.5))
      .toDF("symbol", "funding_time", "rate")
    def run(parts: Int) =
      Stats.trailing(df.repartition(parts), "symbol", "funding_time",
        col("rate").cast("decimal(18,2)"), Seq(Stats.Horizon("m5", 5)))
        .orderBy("symbol").collect().toSeq.map(_.toString)
    assert(run(1) == run(13))
  }
}
