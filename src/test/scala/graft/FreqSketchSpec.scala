package graft

import org.apache.spark.sql.functions._

import graft.ops.FreqSketch

/** Misra-Gries contract: exact on ≤ k distinct items, the
  * n/(k+1)-underestimate bound survives partitioning and merges, heavy
  * items can never be evicted, and estimates never overcount. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("at most k distinct items: the sketch is exact") {
    val items = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c"))
    val df = spark.createDataset(items).toDF("item").repartition(7)
    val got = FreqSketch.heavyHitters(df, "item", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 50L, "b" -> 30L, "c" -> 5L))
  }

  test("bound holds under pressure: est <= true, true - est <= n/(k+1)") {
    // 2000 distinct light items + two planted heavy ones, shuffled
    // across 16 partitions — far over the k=50 capacity
    val light = (0 until 2000).flatMap(i => Seq.fill(3)(s"w$i"))
    val heavy = Seq.fill(900)("HEAVY1") ++ Seq.fill(500)("HEAVY2")
    val all = new scala.util.Random(42).shuffle(light ++ heavy)
    val df = spark.createDataset(all).toDF("item").repartition(16)
    val k = 50
    val n = all.size.toLong
    val slack = n.toDouble / (k + 1)
    val trueCounts = all.groupBy(identity).map { case (s, xs) =>
      s -> xs.size.toLong }
    val got = FreqSketch.heavyHitters(df, "item", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k)
    got.foreach { case (item, est) =>
      val t = trueCounts(item)
      assert(est <= t, s"$item overcounted: est $est > true $t")
      assert(t - est <= slack, s"$item undercounted past the bound")
    }
    // every item with true > n/(k+1) MUST be reported
    trueCounts.filter(_._2 > slack).keys.foreach { item =>
      assert(got.contains(item), s"heavy item $item missing from sketch")
    }
    assert(got.contains("HEAVY1") && got.contains("HEAVY2"))
  }

  test("mergeTwo caps at k and never increases any estimate") {
    val a = Map("x" -> 10L, "y" -> 6L, "z" -> 3L)
    val b = Map("x" -> 5L, "w" -> 8L, "v" -> 1L)
    val m = FreqSketch.mergeTwo(a, b, k = 3)
    assert(m.size <= 3)
    // x's combined mass 15 dominates; the cut subtracts the (k+1)-th
    // largest, so survivors keep est <= combined truth
    assert(m("x") <= 15L && m("x") >= 15L - 4L)
    assert(!m.contains("v")) // the smallest cannot survive a cut
  }

  test("per-group sketches bound independently per group") {
    val rows = (Seq.fill(200)(("g1", "hot")) ++
      (0 until 300).map(i => ("g1", s"w$i")) ++
      Seq.fill(50)(("g2", "only"))).toDF("g", "item").repartition(8)
    val got = graft.ops.FreqSketch
      .heavyHittersPerGroup(rows, "g", "item", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // g1: n=500, slack=500/11≈45 → "hot"(200) must be reported with
    // est within the bound; g2 is exact (1 distinct item ≤ k)
    val hot = got.getOrElse(("g1", "hot"),
      fail("hot item missing from g1's sketch"))
    assert(hot <= 200L && 200L - hot <= 500L / 11L + 1)
    assert(got(("g2", "only")) == 50L)
    assert(got.keys.count(_._1 == "g1") <= 10)
  }

  test("null items are ignored, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val got = FreqSketch.heavyHitters(df, "item", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L))
  }
}
