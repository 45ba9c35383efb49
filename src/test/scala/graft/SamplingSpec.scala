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
}
