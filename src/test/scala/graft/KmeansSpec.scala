package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Deterministic Lloyd training edge cases: empty clusters, convergence
  * to exact means, and reproducibility across runs. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("a centroid that loses all members keeps its seed value") {
    // two tight groups at x=0 and x=10; seeds 0..3 — seeds 1,2 (dups of
    // group members) lose their members to lower-cid twins and must
    // survive as their unrefined seed vectors, not nulls
    // all norms non-zero (the documented input contract)
    val e = emb(
      0L -> Seq(0.2f, 1f), 1L -> Seq(0.1f, 1f), 2L -> Seq(10f, 1f),
      3L -> Seq(10.1f, 1f), 4L -> Seq(0.05f, 1f), 5L -> Seq(10.05f, 1f))
    // train via the public surface: ivfTopK with 4 centroids, 4 probes
    // covers all cells, so the top-k must equal exact brute force —
    // training refined or not, the result is well-defined and non-null
    val got = Similarity.ivfTopK(e, nCentroids = 4, nProbe = 4,
      queryId = 0L, k = 3, trainIters = 2)
      .select("vec_id").as[Long].collect().toSeq
    val exact = Similarity.bruteForceTopK(e, queryId = 0L, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("training is bit-reproducible across independent runs") {
    val e = emb((0L until 40L).map(i =>
      i -> Seq((i % 7).toFloat, (i % 5).toFloat, (i + 1).toFloat / 40f)): _*)
    def run() = Similarity.pqTopK(e, m = 1, dsub = 3, nCentroids = 4,
      queryId = 0L, k = 5, rerank = 2, trainIters = 3)
      .select("vec_id", "cos_sim").collect().toSeq.map(r =>
        (r.getLong(0), r.getDouble(1)))
    assert(run() == run())
  }
}
