package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

/** Hot-key-split join contract: row-identical to the plain join at
  * every threshold, hot keys routed through a broadcast branch, and a
  * loud failure when the "hot" set is really the whole key universe. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows on key 1 (the hot key), 1 row each on 2..50, one NULL key
  private lazy val fact =
    (Seq.fill(1000)(1) ++ (2 to 50) :+ 0).zipWithIndex
      .map { case (k, i) => (if (k == 0) None else Some(k), i.toLong) }
      .toDF("k", "v")
  private lazy val dim =
    ((1 to 60).map(k => (Some(k), s"d$k")) :+ ((None: Option[Int]) -> "dnull"))
      .toDF("k", "name")

  test("row-identical to the plain join, hot branch engaged") {
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "name").collect().toSeq.sorted(RowOrd)
    val split = SkewJoin.skewInnerJoin(fact, dim, "k", hotThreshold = 100L)
    assert(split.select("k", "v", "name").collect().toSeq.sorted(RowOrd)
      == plain)
    // the hot side must actually broadcast — one BroadcastHashJoin in
    // the plan alongside the cold branch's join
    val phys = split.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"))
  }

  test("thresholds that classify nothing / everything behave sanely") {
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "name").collect().toSeq.sorted(RowOrd)
    // nothing hot: falls back to the plain join
    assert(SkewJoin.skewInnerJoin(fact, dim, "k", hotThreshold = 5000L)
      .select("k", "v", "name").collect().toSeq.sorted(RowOrd) == plain)
    // everything "hot" under a tiny cap: loud failure, not a degraded plan
    intercept[IllegalArgumentException] {
      SkewJoin.skewInnerJoin(fact, dim, "k", hotThreshold = 1L, maxHotKeys = 3)
    }
  }

  test("NULL keys are dropped exactly like the plain inner join") {
    val split = SkewJoin.skewInnerJoin(fact, dim, "k", hotThreshold = 100L)
    assert(split.filter($"k".isNull).isEmpty)
    assert(split.count() == fact.join(dim, Seq("k")).count())
  }

  private object RowOrd extends Ordering[org.apache.spark.sql.Row] {
    def compare(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int =
      a.toString.compareTo(b.toString)
  }
}
