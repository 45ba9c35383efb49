package graft

import org.apache.spark.sql.functions._

import graft.ops.Keyset

/** Keyset-pagination invariant (the s5 boundary discipline): the disjoint
  * union of all pages equals one sorted scan — nothing dropped, nothing
  * duplicated — including when a run of equal leading-key values
  * straddles a page boundary, the classic keyset off-by-one. */
class KeysetSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate leading-key run straddling a page boundary") {
    // ts 100 repeats 5× (ids 2..6); with pageSize 3 page 1 ends INSIDE
    // the run (..., (100,2), (100,3)) and page 2 must resume at (100,4)
    // — a leading-key-only cursor would re-emit or skip the run's tail.
    val rows = Seq(
      (50L, 1L), (100L, 2L), (100L, 3L), (100L, 4L), (100L, 5L),
      (100L, 6L), (200L, 7L), (200L, 8L), (300L, 9L), (300L, 10L)
    ).toDF("ts", "id").withColumn("payload", col("id") * 10)

    val pages = Keyset.walk(rows, Seq("ts", "id"), n = 3)
    assert(pages.length == 4) // 3+3+3+1
    val walked = pages.flatMap(_.select("ts", "id", "payload")
      .as[(Long, Long, Long)].collect())
    val oneScan = rows.orderBy("ts", "id")
      .select("ts", "id", "payload").as[(Long, Long, Long)].collect().toSeq
    assert(walked == oneScan)
    // the straddle really happened: page 1 ends mid-run, page 2 resumes it
    assert(pages(0).select("ts", "id").as[(Long, Long)].collect().last ==
      ((100L, 3L)))
    assert(pages(1).select("ts", "id").as[(Long, Long)].collect().head ==
      ((100L, 4L)))
  }

  test("orders fixture: >=3 pages reassemble the sorted scan exactly") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderdate", "o_orderkey", "o_totalprice")
    val total = orders.count()
    val n = (total / 4).toInt // forces >= 4 pages over real data
    val pages = Keyset.walk(orders, Seq("o_orderdate", "o_orderkey"), n)
    assert(pages.length >= 4)

    val walked = pages.flatMap(_.collect().map(r =>
      (r.get(0).toString, r.getLong(1), r.getDouble(2))))
    val oneScan = orders.orderBy("o_orderdate", "o_orderkey").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2))).toSeq
    assert(walked.size == total)
    assert(walked == oneScan)
    // sanity on real data: the fixture actually has duplicate dates, so
    // the total-order tiebreak is doing real work in this walk
    assert(orders.groupBy("o_orderdate").count()
      .filter(col("count") > 1).count() > 0)
  }

  test("page predicate stays sargable: pushed to the parquet scan") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderdate", "o_orderkey", "o_totalprice")
    val p2 = Keyset.page(orders, Seq("o_orderdate", "o_orderkey"),
      Some(Seq(lit("1997-06-01 00:00:00").cast("timestamp"), lit(500L))),
      25)
    val physical = p2.queryExecution.executedPlan.toString
    // the OR-of-prefixes form pushes at least the leading-column bound
    assert(physical.contains("PushedFilters") &&
      physical.contains("o_orderdate"))
    // and the page is a top-k, not a global sort
    assert(physical.contains("TakeOrderedAndProject"))
  }

  test("NULL sort value on a page boundary is refused, not truncated") {
    // Ascending order sorts NULLS FIRST, so with pageSize 2 the first
    // boundary lands on a null ts row; the cursor lit(null) would make
    // every after() comparison NULL → empty page 2 → walk "done" with
    // 6 of 8 rows silently missing. The guard must throw instead.
    val rows = Seq(
      (None: Option[Long], 1L), (None, 2L), (None, 3L),
      (Some(10L), 4L), (Some(20L), 5L), (Some(30L), 6L),
      (Some(40L), 7L), (Some(50L), 8L)
    ).toDF("ts", "id")
    val ex = intercept[IllegalStateException] {
      Keyset.walk(rows, Seq("ts", "id"), n = 2)
    }
    assert(ex.getMessage.contains("NULL") &&
      ex.getMessage.contains("ts"))

    // but nulls that DON'T land on a boundary are fine: all null rows
    // fit on page 1 (nulls first), boundary row is non-null, the walk
    // still reassembles the full sorted scan.
    val pages = Keyset.walk(rows, Seq("ts", "id"), n = 4)
    val walked = pages.flatMap(_.select("id").as[Long].collect())
    assert(walked == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("walk refuses to stream a table past maxPages") {
    val big = spark.range(100).toDF("id").withColumn("ts", col("id"))
    val ex = intercept[IllegalStateException] {
      Keyset.walk(big, Seq("ts", "id"), n = 1, maxPages = 5)
    }
    assert(ex.getMessage.contains("maxPages"))
  }
}
