package graft

import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg

/** The merge-algebra contract behind incremental rollup maintenance:
  * partial states merged in ANY grouping/order equal the one-shot
  * aggregate — bit-for-bit, because the accumulators are decimal. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1.5), ("a", 2.25), ("a", -0.75), ("b", 10.0),
    ("b", 0.0001), ("c", -5.5), ("a", 3.125), ("b", 7.75))

  test("state merged from any batch split equals the one-shot partial") {
    val df = rows.toDF("k", "v")
    val oneShot = IncrementalAgg.finalize(
      IncrementalAgg.partial(df, Seq("k"), "v"))
      .orderBy("k").collect().toSeq
    // three different splits, one of them with an empty batch
    val splits = Seq(
      Seq(df.filter($"v" > 2), df.filter($"v" <= 2)),
      Seq(df.limit(0), df),
      (0 to 2).map(i => df.filter(pmod(hash($"k", $"v"), lit(3)) === i)))
    splits.foreach { batches =>
      val merged = batches
        .map(b => IncrementalAgg.partial(b, Seq("k"), "v"))
        .reduce(IncrementalAgg.merge(_, _))
      val got = IncrementalAgg.finalize(merged).orderBy("k").collect().toSeq
      assert(got == oneShot, s"split with ${batches.size} batches diverged")
    }
    // and merge is order-insensitive
    val ps = (0 to 2).map(i =>
      IncrementalAgg.partial(
        df.filter(pmod(hash($"k", $"v"), lit(3)) === i), Seq("k"), "v"))
    val fwd = IncrementalAgg.finalize(ps.reduce(IncrementalAgg.merge(_, _)))
      .orderBy("k").collect().toSeq
    val rev = IncrementalAgg.finalize(ps.reverse.reduce(IncrementalAgg.merge(_, _)))
      .orderBy("k").collect().toSeq
    assert(fwd == rev && fwd == oneShot)
  }

  test("a new group arriving in a later batch appears with exact stats") {
    val b1 = Seq(("a", 1.0)).toDF("k", "v")
    val b2 = Seq(("z", 4.5), ("z", 5.5)).toDF("k", "v")
    val out = IncrementalAgg.finalize(IncrementalAgg.merge(
      IncrementalAgg.partial(b1, Seq("k"), "v"),
      IncrementalAgg.partial(b2, Seq("k"), "v")))
      .orderBy("k")
      .select("k", "n", "sum_value", "avg_value").as[(String, Long, Double, Double)]
      .collect().toSeq
    assert(out == Seq(("a", 1L, 1.0, 1.0), ("z", 2L, 10.0, 5.0)))
  }

  test("merging states with mismatched keys throws") {
    val s1 = IncrementalAgg.partial(Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v")
    val s2 = IncrementalAgg.partial(
      Seq(("a", "x", 1.0)).toDF("k", "k2", "v"), Seq("k", "k2"), "v")
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(s1, s2)
    }
  }

  // --- approx-distinct sketch accumulator ----------------------------

  private lazy val users = (0L until 3000L)
    .map(i => (if (i % 2 == 0) "a" else "b", s"u${i % 700}", i.toDouble))
    .toDF("k", "user", "v")

  test("sketch estimate is split-insensitive and near exact") {
    def est(batches: Seq[org.apache.spark.sql.DataFrame]): Map[String, Long] =
      IncrementalAgg.finalize(batches
        .map(b => IncrementalAgg.partial(b, Seq("k"), "v", Some("user")))
        .reduce(IncrementalAgg.merge(_, _)))
        .select("k", "approx_distinct")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = est(Seq(users))
    val split = est((0 to 2).map(i => users.filter($"v" % 3 === i)))
    assert(oneShot == split) // register-max merge: split cannot move it
    val exact = users.groupBy("k")
      .agg(countDistinct($"user").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      assert(math.abs(oneShot(k) - d) <= d * 0.05,
        s"estimate ${oneShot(k)} too far from exact $d for group $k")
    }
  }

  test("re-merging the same delta is idempotent for the sketch") {
    val delta = IncrementalAgg.partial(users, Seq("k"), "v", Some("user"))
    val once = IncrementalAgg.merge(delta, delta)
    val est = IncrementalAgg.finalize(once)
      .select("k", "approx_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = IncrementalAgg.finalize(delta)
      .select("k", "approx_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == single) // n doubles (its documented semantics); sketch doesn't
  }

  test("inconsistent distinctCol usage across batches throws") {
    val withSketch = IncrementalAgg.partial(users, Seq("k"), "v", Some("user"))
    val without = IncrementalAgg.partial(users, Seq("k"), "v")
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(withSketch, without)
    }
  }

  // --- MG heavy-hitter + KLL quantile accumulators -------------------

  // skewed items: item "h0" dominates group a, "h1" dominates group b —
  // heavy enough to clear the n/(k+1) reporting threshold at k=8
  private lazy val skewed = (0L until 4000L).map { i =>
    val g = if (i % 2 == 0) "a" else "b"
    val item = if (i % 3 != 2) s"h${i % 2}" else s"t${i % 97}"
    (g, item, i.toDouble)
  }.toDF("k", "item", "v")

  /** MG bound + KLL rank bound of a state, verified against exact
    * per-group truths — the invariant that must survive ANY batch
    * split (summaries differ by merge order; the BOUNDS cannot). */
  private def assertSketchState(state: org.apache.spark.sql.DataFrame,
      k: Int): Unit = {
    val exact = skewed.groupBy("k", "item").agg(count(lit(1)).as("true_n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val totals = skewed.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = IncrementalAgg.finalize(state)
      .select("k", "n", "top_items", "kll_sketch").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    rows.foreach { r =>
      val g = r.getString(0)
      val bound = totals(g).toDouble / (k + 1)
      val items = r.getAs[Map[String, Long]]("top_items")
      assert(items.size <= k)
      items.foreach { case (item, est) =>
        val truth = exact((g, item))
        assert(est <= truth && truth - est <= bound,
          s"MG bound violated for ($g, $item): est=$est true=$truth")
      }
      // every item above the threshold must be reported
      exact.collect { case ((`g`, item), n) if n > bound => item }
        .foreach(h => assert(items.contains(h), s"heavy $h missing in $g"))
      // KLL: count matches the group, p50/p90 ranks within the bound
      val bytes = r.getAs[Array[Byte]]("kll_sketch")
      assert(graft.ops.QuantileSketch.countOf(bytes) == totals(g))
      val vals = skewed.filter($"k" === g).select("v").as[Double]
        .collect().sorted
      Seq(0.5, 0.9).foreach { p =>
        val est = graft.ops.QuantileSketch.quantilesOf(bytes, Seq(p)).head
        val rank = vals.count(_ <= est).toDouble / vals.length
        assert(math.abs(rank - p) <= 0.025, s"KLL rank $rank at p=$p in $g")
      }
    }
  }

  test("MG + KLL state bounds hold under any split and replay shape") {
    val k = 8
    def state(batches: Seq[org.apache.spark.sql.DataFrame]) = batches
      .map(b => IncrementalAgg.partial(b, Seq("k"), "v",
        heavyHitterCol = Some("item"), heavyHitterK = k, quantileK = 200))
      .reduce((a, b) =>
        IncrementalAgg.merge(a, b, heavyHitterK = k, quantileK = 200))
    // one-shot, a 3-way split, and a split with an empty batch all
    // satisfy the same bounds (summaries may differ; bounds cannot)
    assertSketchState(state(Seq(skewed)), k)
    assertSketchState(
      state((0 to 2).map(i => skewed.filter($"v" % 3 === i))), k)
    assertSketchState(state(Seq(skewed.limit(0), skewed)), k)
  }

  test("inconsistent sketch accumulator usage across batches throws") {
    val withMg = IncrementalAgg.partial(skewed, Seq("k"), "v",
      heavyHitterCol = Some("item"))
    val without = IncrementalAgg.partial(skewed, Seq("k"), "v")
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(withMg, without)
    }
    val withKll = IncrementalAgg.partial(skewed, Seq("k"), "v",
      quantileK = 200)
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(withKll, without)
    }
  }
}
