package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Priority-sampling properties: per-stratum cap, layout independence
  * (the picked set is a pure function of the data), and the weight
  * dominance bound (priority ∈ [w, w·2^60), so a row whose weight
  * exceeds every other row's w·2^60 must always rank first).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 200L)
    .map(i => (i, s"src${i % 4}", 1L + i % 7))
    .toDF("doc_id", "source", "weight")

  test("per-stratum cap and rank contiguity") {
    val out = Sampling.prioritySample(docs, col("doc_id"), col("weight"),
      col("source"), k = 5)
    val perSrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("sample_rank").as("mx"),
        min("sample_rank").as("mn"))
      .collect()
    assert(perSrc.length == 4)
    perSrc.foreach { r =>
      assert(r.getAs[Long]("n") == 5L)
      assert(r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx") == 5)
    }
  }

  test("picked set is identical across partition layouts") {
    def pick(df: org.apache.spark.sql.DataFrame) =
      Sampling.prioritySample(df, col("doc_id"), col("weight"),
        col("source"), k = 5)
        .select("source", "doc_id", "sample_rank")
        .collect().map(_.toSeq).toSet
    assert(pick(docs.repartition(13)) == pick(docs.coalesce(1)))
  }

  test("a weight-dominant row always ranks first in its stratum") {
    // priority = w/u with u in (2^-60, 1]: dominant row's floor priority
    // (its weight) exceeds any light row's ceiling (w_l * 2^60)
    val heavy = docs.withColumn("weight",
      when(col("doc_id") === 42L, lit(Long.MaxValue))
        .otherwise(lit(1L)))
    val first = Sampling.prioritySample(heavy, col("doc_id"), col("weight"),
      lit("all"), k = 1).select("doc_id").collect()
    // Long.MaxValue < 1 * 2^63, but u >= 2^-60 means light ceiling is
    // 2^60 < 2^63 = heavy floor as double — strict dominance holds
    assert(first.map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("stratified sample: per-stratum ceil quota, rare strata kept") {
    // strata of very different sizes; a 10% sample must keep every
    // stratum at ceil(0.1 * n): 160→16, 30→3, 9→1, 1→1 — the rare
    // stratum never vanishes (plain 10% hash-sampling drops it ~90% of
    // the time).
    val rows = ((1L to 160L).map(i => (i, "big")) ++
      (161L to 190L).map(i => (i, "mid")) ++
      (191L to 199L).map(i => (i, "small")) ++
      Seq((200L, "rare"))).toDF("doc_id", "stratum")
    val out = Sampling.stratifiedSample(rows, col("stratum"),
      col("doc_id"), 0.1)
    val bySt = out.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(bySt == Map("big" -> 16L, "mid" -> 3L, "small" -> 1L,
      "rare" -> 1L))
    // layout-independent: same picked set after a repartition
    val again = Sampling.stratifiedSample(rows.repartition(13),
      col("stratum"), col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("mixture weights: sqrt dampening, exact integer quotas") {
    val df = (1L to 1600L).map(i => (i, "a")) ++ // 1600 docs
      (1L to 400L).map(i => (i + 10000, "b")) ++ // 400
      (1L to 100L).map(i => (i + 20000, "c")) // 100
    val out = Sampling.mixtureWeights(df.toDF("doc_id", "source"),
      col("source"), budget = 1000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // w = floor(sqrt(n * 1e6)): perfect squares here → exact sqrt ratios
    // 40:20:10 → shares 4/7, 2/7, 1/7 and quotas floor(1000*w/Σw)
    assert(out("a")._2 == 40000L) // floor(sqrt(1.6e9))
    assert(out("b")._2 == 20000L)
    assert(out("c")._2 == 10000L)
    assert(out("a")._4 == 571L) // floor(1000 * 40000 / 70000)
    assert(out("b")._4 == 285L)
    assert(out("c")._4 == 142L)
    assert(math.abs(out("a")._3 - 4.0 / 7.0) < 1e-15)
    // quotas under-fill by < n_sources (floor discipline)
    assert(Seq(571L, 285L, 142L).sum <= 1000 &&
      Seq(571L, 285L, 142L).sum > 1000 - 3)
  }
}
