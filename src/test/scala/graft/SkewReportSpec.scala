package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewGuard

/** keySkew is the pre-shuffle diagnostic: exact heavy-hitter counts,
  * deterministic order, and NULL treated as a key value (it is often
  * the heaviest one — the whole reason to look). */
class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("exact counts, shares, deterministic tie-break, topK bound") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      Seq.fill(25)("cool") ++ Seq.fill(10)("rare"))
      .toDF("k").repartition(7)
    val out = SkewGuard.keySkew(df, Seq("k"), topK = 3)
      .as[(String, Long, Double)].collect().toSeq
    // warm/cool tie at 25 breaks by key ascending
    assert(out.map(r => (r._1, r._2)) ==
      Seq(("hot", 60L), ("cool", 25L), ("warm", 25L)))
    assert(out.head._3 == 60.0 / 120.0)
    assert(out.size == 3) // rare is cut by topK
  }

  test("null keys are counted, not dropped") {
    val df = Seq(Some("a"), None, None, None, Some("b"))
      .toDF("k")
    val out = SkewGuard.keySkew(df, Seq("k"), topK = 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 3L), (Some("a"), 1L)))
  }
}
