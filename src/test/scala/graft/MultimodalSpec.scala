package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Similarity}

/** Multimodal plumbing beyond the oracle-checked m1/m2: resize geometry,
  * feature extraction shape/determinism, and features feeding the
  * similarity operators end-to-end. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("resize fits within maxDim preserving aspect, deterministically") {
    val out = Multimodal.resize(docs, maxDim = 100).collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      assert(r.width <= 100 && r.height <= 100 && r.width >= 1 && r.height >= 1)
    }
    val again = Multimodal.resize(docs, maxDim = 100).collect()
    assert(out.map(_.sha256).toSeq === again.map(_.sha256).toSeq)
  }

  test("extracted features are fixed-width, in [0,1], and similarity-ready") {
    val feats = Multimodal.extractFeatures(docs, dims = 8)
    val rows = feats.collect()
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(_.features.forall(f => f >= 0f && f <= 1f)))

    // features flow straight into the similarity surface
    val emb = feats.toDF()
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val top = Similarity.bruteForceTopK(emb, queryId = rows.head.doc_id, k = 3)
      .collect()
    assert(top.length === 3)
    assert(top.forall(r => !r.isNullAt(1)))
  }
}
