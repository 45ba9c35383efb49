package graft

import graft.ops.{Similarity, TextDedup}

/** Sanity tests for the near-dup family: exact copies are found with
  * similarity 1.0; unrelated docs are not paired. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely different words about spark window aggregation shuffles and joins"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday")
  ).toDF("doc_id", "text")

  test("minhash-lsh finds exact and near duplicates, not unrelated docs") {
    val pairs = TextDedup.minHashNearDups(docs, k = 16, bands = 4, threshold = 0.4)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 1L && j == 1.0 })
    assert(pairs.forall { case (a, b, _) => Set(a, b).subsetOf(Set(0L, 1L, 3L)) })
  }

  test("simhash: identical docs have identical fingerprints (hamming 0)") {
    val pairs = TextDedup.simHashNearDups(docs, bits = 48, chunks = 4,
      maxHamming = 3).as[(Long, Long, Int)].collect().toSeq
    assert(pairs.exists { case (a, b, h) => a == 0L && b == 1L && h == 0 })
    assert(pairs.forall { case (a, b, _) => !(Set(a, b) contains 2L) })
  }

  test("embedding near-dup: identical vectors pair at cosine 1") {
    val emb = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(-4f, 3f, -2f, 1f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(emb, bits = 4, threshold = 0.99)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    assert(math.abs(pairs.head._3 - 1.0) < 1e-12)
  }
}
