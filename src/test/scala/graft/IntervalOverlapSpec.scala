package graft

import graft.ops.Joins

/** Interval-overlap join edges: half-open boundary semantics (touching
  * intervals do NOT overlap), multi-bucket pairs dedup to one row, and
  * bucket-boundary-straddling intervals still meet their partners. */
class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("half-open semantics, dedup across buckets, boundary straddle") {
    // bucket = 100s
    val a = Seq(
      (1L, 0L, 100L), // touches b10 exactly at 100 -> NO overlap
      (2L, 50L, 250L), // spans buckets 0,1,2; overlaps b11 and b12
      (3L, 400L, 420L) // isolated
    ).toDF("id", "startSec", "endSec")
    val b = Seq(
      (10L, 100L, 150L), // starts exactly where a1 ends
      (11L, 90L, 110L), // overlaps a2 (and NOT a1? 90 < 100 -> yes a1!)
      (12L, 240L, 300L) // overlaps a2's tail only
    ).toDF("id", "startSec", "endSec")

    val pairs = Joins.intervalOverlap(a, b, bucketSeconds = 100L)
      .as[(Long, Long)].collect().toSet

    // a1=[0,100) vs b10=[100,150): touching, half-open -> excluded
    // a1=[0,100) vs b11=[90,110): 90 < 100 -> overlap
    // a2=[50,250) vs b10, b11, b12 -> overlap (b11 met in 2 shared
    //   buckets: must appear ONCE); a3 meets nothing
    assert(pairs == Set((1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L)))
  }

  test("empty and inverted intervals overlap nothing") {
    // [x, x) is empty and [x, y) with y < x is inverted; the half-open
    // contract says both overlap NOTHING — even when they sit strictly
    // inside a non-empty partner (where the raw predicate
    // a_s < b_e && b_s < a_e would hold).
    val a = Seq(
      (1L, 50L, 50L), // empty, inside b10
      (2L, 60L, 40L), // inverted, inside b10
      (3L, 10L, 90L) // genuine interval, overlaps b10
    ).toDF("id", "startSec", "endSec")
    val b = Seq(
      (10L, 0L, 100L),
      (11L, 200L, 200L) // empty on the right side too
    ).toDF("id", "startSec", "endSec")

    val pairs = Joins.intervalOverlap(a, b, bucketSeconds = 100L)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 10L)))
  }
}
