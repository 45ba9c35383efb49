package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Property tests for the scalar layer — notably the ceiling bucket (F9),
  * whose reference semantics (`(epoch // p + 1) * p`,
  * lending_data_etl.py:54-57) rounds exact boundaries UP. Sampling is
  * seeded and evaluated in one DataFrame pass (one Spark job, not one per
  * sample). */
class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("toSnake handles the reference's rename cases") {
    assert(Fns.toSnake("baseCurrency") == "base_currency")
    assert(Fns.toSnake("turnoverOf24h") == "turnover_of24h")
    assert(Fns.toSnake("symbol") == "symbol")
    assert(Fns.toSnake("Symbol") == "symbol")
  }

  test("ceilBucket properties: result > input, aligned, within interval") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(2000) {
      // epoch millis across 2024, arbitrary sub-second parts
      1704067200000L + (rnd.nextDouble() * 31622400000L).toLong
    }
    val rows = samples.map(new Timestamp(_)).toDF("ts")
      .select(col("ts"), Fns.ceilBucket(col("ts"), 300).as("b"))
      .collect()
    rows.foreach { row =>
      val t = row.getTimestamp(0).getTime
      val b = row.getTimestamp(1).getTime
      assert(b > t, s"bucket must be strictly after the input ($t)")
      assert(b % 300000 == 0, s"bucket must sit on a 300s boundary ($b)")
      assert(b - t <= 300000, s"bucket at most one interval ahead ($t)")
    }
  }

  test("ceilBucket rounds an exact boundary up to the NEXT one") {
    val boundary = Timestamp.valueOf("2024-01-01 00:05:00")
    val b = Seq(boundary).toDF("ts")
      .select(Fns.ceilBucket(col("ts"), 300)).head().getTimestamp(0)
    assert(b == Timestamp.valueOf("2024-01-01 00:10:00"))
  }

  test("F8 load-time stamping: injected clock and wall clock both flow through") {
    import graft.pipelines.Lending
    val raw = Seq(
      (7, "0.300000", Timestamp.valueOf("2024-03-01 09:00:00")),
      (7, "0.400000", Timestamp.valueOf("2024-03-01 09:30:00")))
      .toDF("term", "rate", "observed_at")
    // injected fixed clock → deterministic reference semantics (utcnow
    // ceil-bucketed to the next 5-minute boundary)
    val fixed = Lending.transform(raw,
      Some(lit(Timestamp.valueOf("2024-03-01 10:02:00")))).collect().head
    assert(fixed.getTimestamp(0) == Timestamp.valueOf("2024-03-01 10:05:00"))
    assert(fixed.getDouble(1) == 0.3)
    // wall-clock variant: created_at lands in the bucket after "now"
    val before = System.currentTimeMillis()
    val wall = Lending.transformAtLoadTime(raw).collect().head
    val createdMs = wall.getTimestamp(0).toInstant.toEpochMilli
    assert(createdMs > before && createdMs <= before + 310 * 1000L)
  }
}
