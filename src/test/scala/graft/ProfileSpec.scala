package graft

import org.apache.spark.sql.functions._

import graft.ops.Profile

/** Schema-driven profiling contract: one op profiles ANY table with no
  * per-table code — every column appears with the right lane for its
  * type, counts are exact, the whole report costs ONE scan, and the
  * approx-distinct lane stays within sketch tolerance. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("documents: every column profiled, lanes match types") {
    val docs = Tables.documents(spark, sfDir)
    val p = Profile.profile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == docs.columns.toSet)

    val n = docs.count()
    assert(p.values.forall(_.getLong(1) == n))
    // numeric lane filled for bigints, string lane null — and vice versa
    val docId = p("doc_id")
    assert(!docId.isNullAt(4) && !docId.isNullAt(5) &&
      docId.isNullAt(6) && docId.isNullAt(7))
    val lang = p("lang")
    assert(lang.isNullAt(4) && lang.isNullAt(5) &&
      !lang.isNullAt(6) && !lang.isNullAt(7))
    // exact cross-check against direct aggregates
    assert(docId.getLong(3) ==
      docs.select(countDistinct("doc_id")).as[Long].head())
    assert(lang.getString(6) ==
      docs.agg(min("lang")).as[String].head())
    assert(p("n_chars").getDouble(5) ==
      docs.agg(max("n_chars")).as[Long].head().toDouble)
  }

  test("lineitem: temporal min/max render into the string lane in order") {
    val li = Tables.lineitem(spark, sfDir)
    val p = Profile.profile(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == li.columns.toSet)
    val ship = p("l_shipdate")
    // timestamp column: num lane null, string lane carries ISO min/max
    assert(ship.isNullAt(4) && ship.isNullAt(5))
    assert(ship.getString(6) ==
      li.agg(min(col("l_shipdate")).cast("string")).as[String].head())
    assert(ship.getString(6) <= ship.getString(7)) // ISO = lexical order
    // null accounting on a column with no nulls
    assert(p("l_quantity").getLong(2) == 0L)
  }

  test("nulls and non-orderable columns: counted, lanes empty") {
    val df = Seq(
      (1L, Some("a"), Seq(1, 2)),
      (2L, None, Seq(3)),
      (3L, Some("b"), Seq.empty[Int])
    ).toDF("id", "s", "arr")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("s").getLong(2) == 1L) // one null
    assert(p("s").getLong(3) == 2L) // distinct ignores the null
    val arr = p("arr") // array: counts only, every lane null
    assert(arr.getLong(3) == 3L)
    assert((4 to 7).forall(arr.isNullAt))
  }

  test("map columns profile instead of failing analysis") {
    // Spark rejects distinct aggregation on map-bearing types (no map
    // equality in Spark SQL) — profile must still cover such tables,
    // counting distinct to_json ENCODINGS for the map lanes.
    val df = Seq(
      (1L, Map("a" -> 1), Some(Map("x" -> 1.0))),
      (2L, Map("a" -> 1), None),
      (3L, Map("b" -> 2), Some(Map("x" -> 1.0)))
    ).toDF("id", "m", "om")
    Seq(true, false).foreach { exact =>
      val p = Profile.profile(df, exactDistinct = exact).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(p.keySet == Set("id", "m", "om"))
      assert(p("m").getLong(2) == 0L) // no nulls
      assert(p("m").getLong(3) == 2L) // {a->1} ×2, {b->2}
      assert(p("om").getLong(2) == 1L)
      assert(p("om").getLong(3) == 1L)
      assert((4 to 7).forall(p("m").isNullAt)) // counts-only lanes
    }
  }

  test("single-pass plan and approx-distinct lane") {
    val docs = Tables.documents(spark, sfDir)
    // approx lane: no Expand operator in the plan (the exact-distinct
    // price), n_distinct within HLL tolerance of truth
    val approx = Profile.profile(docs, exactDistinct = false)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
    val got = approx.filter(col("col_name") === "doc_id")
      .select("n_distinct").as[Long].head().toDouble
    val truth = docs.select(countDistinct("doc_id")).as[Long].head().toDouble
    assert(math.abs(got - truth) / truth < 0.05)
  }
}
