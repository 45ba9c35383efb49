package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Scd

/** Golden tests for the SCD2 history build: run-collapse, interval
  * chaining, null-attribute transitions, and the single-shuffle plan
  * shape (both window passes must share one Exchange on the key).
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("consecutive equal states collapse; intervals chain exactly") {
    // u1: A A B A  -> 3 changes (A, B, A); u2: X only -> 1 current row
    val df = Seq(
      (1L, ts(1), "A", 101L), (1L, ts(2), "A", 102L),
      (1L, ts(3), "B", 103L), (1L, ts(4), "A", 104L),
      (2L, ts(1), "X", 201L)
    ).toDF("user_id", "ts", "state", "event_id")

    val out = Scd.scd2(df, "user_id", "ts", "state",
      Seq(col("event_id").asc))
      .orderBy("user_id", "change_seq").collect()

    assert(out.length == 4)
    val u1 = out.take(3)
    assert(u1.map(_.getAs[String]("state")).toSeq == Seq("A", "B", "A"))
    // each interval closes exactly where the next opens
    assert(u1(0).getAs[Timestamp]("valid_to") ==
      u1(1).getAs[Timestamp]("valid_from"))
    assert(u1(1).getAs[Timestamp]("valid_to") ==
      u1(2).getAs[Timestamp]("valid_from"))
    // the A->A repeat at ts(2) must NOT open an interval
    assert(u1(0).getAs[Timestamp]("valid_from") == ts(1))
    assert(u1(0).getAs[Timestamp]("valid_to") == ts(3))
    // only the last change per key is current
    assert(out.count(_.getAs[Boolean]("is_current")) == 2)
    assert(u1(2).getAs[Boolean]("is_current"))
    assert(out(3).getAs[Boolean]("is_current"))
  }

  test("null attribute values are states: X->null->X is three changes") {
    val df = Seq(
      (1L, ts(1), Some("X"), 1L),
      (1L, ts(2), None, 2L),
      (1L, ts(3), None, 3L),
      (1L, ts(4), Some("X"), 4L)
    ).toDF("user_id", "ts", "state", "event_id")

    val out = Scd.scd2(df, "user_id", "ts", "state",
      Seq(col("event_id").asc))
      .orderBy("change_seq").collect()
    assert(out.map(_.getAs[String]("state")).toSeq == Seq("X", null, "X"))
    // the null interval is properly bounded on both sides
    assert(out(1).getAs[Timestamp]("valid_from") == ts(2))
    assert(out(1).getAs[Timestamp]("valid_to") == ts(4))
  }

  test("same-timestamp changes order by the tiebreak; change_seq is total") {
    val df = Seq(
      (1L, ts(1), "X", 1L), (1L, ts(1), "Y", 2L), (1L, ts(1), "X", 3L)
    ).toDF("user_id", "ts", "state", "event_id")
    val out = Scd.scd2(df, "user_id", "ts", "state",
      Seq(col("event_id").asc))
      .orderBy("change_seq").collect()
    assert(out.map(_.getAs[String]("state")).toSeq == Seq("X", "Y", "X"))
    assert(out.map(_.getAs[Long]("change_seq")).toSeq == Seq(1L, 2L, 3L))
  }

  test("plan: both window passes share ONE exchange on the key") {
    val df = Seq((1L, ts(1), "A", 1L)).toDF("user_id", "ts", "state", "event_id")
    val plan = Scd.scd2(df, "user_id", "ts", "state",
      Seq(col("event_id").asc))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
