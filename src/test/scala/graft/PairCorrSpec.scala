package graft

import org.apache.spark.sql.functions._

import graft.ops.PairCorr

/** Pair-budget contract of the correlation screen: a planted oversized
  * series universe is capped to the budgeted pair count, the keep-list is
  * deterministic (densest first, name tie-break), the dropped remainder is
  * REPORTED (never silently truncated), and the Pearson arithmetic is
  * right on hand-computable series. */
class PairCorrSpec extends SparkSpec {
  import spark.implicits._

  test("seriesBudget: largest S with S(S-1)/2 <= maxPairs, floor 2") {
    assert(PairCorr.seriesBudget(1L) == 2)
    assert(PairCorr.seriesBudget(2L) == 2) // 3 symbols need 3 pairs
    assert(PairCorr.seriesBudget(3L) == 3)
    assert(PairCorr.seriesBudget(66L) == 12)
    assert(PairCorr.seriesBudget(70L) == 12) // 13 would need 78
    assert(PairCorr.seriesBudget(1000L) == 45)
    // exact squares around the boundary
    assert(PairCorr.seriesBudget(4950L) == 100)
    assert(PairCorr.seriesBudget(4949L) == 99)
  }

  test("oversized universe is capped to the budget, dropped are reported") {
    // 100 series on a shared 48-hour grid; series i gets 48 - (i / 10)
    // observations, so density RANKS the series: s000..s009 densest (48),
    // then s010..s019 (47), ... A budget of 45 pairs keeps 10 series —
    // exactly the densest block, name-tiebroken inside it.
    val grid = (0 until 100).flatMap { i =>
      val sym = f"s$i%03d"
      (0 until 48 - i / 10).map(h => (sym, h.toLong, i * 1.0 + h))
    }.toDF("symbol", "h", "raw")
      .withColumn("v", col("raw").cast("decimal(18,4)"))
      .drop("raw")

    val pairs = PairCorr.pearsonPairs(grid, "symbol", "h", "v",
      maxPairs = 45L, minOverlap = 2L)
    val out = pairs.select("sym_a", "sym_b")
      .as[(String, String)].collect()
    assert(out.length == 45) // full matrix of the 10 kept, within budget
    val keptSyms = out.flatMap(p => Seq(p._1, p._2)).toSet
    assert(keptSyms == (0 until 10).map(i => f"s$i%03d").toSet)

    // the other 90 are reported with their observation counts
    val dropped = PairCorr.droppedSeries(grid, "symbol", maxPairs = 45L)
      .as[(String, Long)].collect()
    assert(dropped.length == 90)
    assert(dropped.map(_._1).toSet ==
      (10 until 100).map(i => f"s$i%03d").toSet)
    // densest-first report order; counts match the planted density
    assert(dropped.head == ("s010", 47L))
    assert(dropped.toMap.apply("s099") == 39L)
  }

  test("keep-list tie-break is name-ascending at equal density") {
    val grid = Seq("zz", "aa", "mm").flatMap { sym =>
      (0 until 10).map(h => (sym, h.toLong, h * 1.0))
    }.toDF("symbol", "h", "raw")
      .withColumn("v", col("raw").cast("decimal(18,4)")).drop("raw")
    // budget of 1 pair keeps 2 of 3 equally-dense series: aa, mm by name
    val kept = PairCorr.keepSeries(grid, "symbol",
      PairCorr.seriesBudget(1L)).as[String].collect().toSet
    assert(kept == Set("aa", "mm"))
    assert(PairCorr.droppedSeries(grid, "symbol", 1L)
      .as[(String, Long)].collect().toSeq == Seq(("zz", 10L)))
  }

  test("pearson values: perfect correlation and anti-correlation") {
    // y = 2x + 1 (corr +1), z = -x (corr -1 with x)
    val grid = (0 until 8).flatMap { h =>
      Seq(("x", h.toLong, h.toDouble),
        ("y", h.toLong, 2.0 * h + 1.0),
        ("z", h.toLong, -h.toDouble))
    }.toDF("symbol", "h", "raw")
      .withColumn("v", col("raw").cast("decimal(18,4)")).drop("raw")
    val got = PairCorr.pearsonPairs(grid, "symbol", "h", "v",
      maxPairs = 100L, minOverlap = 8L)
      .select("sym_a", "sym_b", "corr")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(got(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(got(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(got(("y", "z")) + 1.0) < 1e-12)
  }

  test("zero-variance series yields NULL corr; thin overlap filtered") {
    val grid = ((0 until 8).map(h => ("flat", h.toLong, 5.0)) ++
      (0 until 8).map(h => ("move", h.toLong, h.toDouble)) ++
      // only 3 shared hours with the others
      (0 until 3).map(h => ("thin", h.toLong, h * 2.0)))
      .toDF("symbol", "h", "raw")
      .withColumn("v", col("raw").cast("decimal(18,4)")).drop("raw")
    val rows = PairCorr.pearsonPairs(grid, "symbol", "h", "v",
      maxPairs = 100L, minOverlap = 4L)
      .select("sym_a", "sym_b", "corr")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("flat", "move"))) // thin pairs fail minOverlap
    assert(rows.head.isNullAt(2)) // flat series: NULL, not an error
  }
}
