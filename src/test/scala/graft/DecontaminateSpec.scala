package graft

import org.apache.spark.sql.functions._

import graft.ops.{Decontaminate, TextDedup}

/** Bloom-prefilter contract: the prune is a guaranteed SUPERSET of the
  * true members (no false negatives, ever), it genuinely shrinks the
  * big side, and the composed decontamination result is bit-identical
  * to the plain exact join it replaces. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("bloomPrune: superset of members, and actually prunes") {
    val corpus = spark.range(10000).select(col("id"),
      concat(lit("key_"), col("id")).as("k"))
    val keys = spark.range(0, 10000, 100).select(
      concat(lit("key_"), col("id")).as("k")) // every 100th key
    val pruned = Decontaminate.bloomPrune(spark, corpus, "k", keys, "k",
      expectedItems = 100, fpp = 0.01)
    val prunedIds = pruned.select("id").as[Long].collect().toSet
    // no false negatives: every true member survives the prune
    (0L until 10000L by 100).foreach(id => assert(prunedIds.contains(id)))
    // and the prune bites: ~100 members + ~1% fpp of 9900 ≈ 200 max
    assert(prunedIds.size < 500, s"pruned to ${prunedIds.size}")
    // null probes are kept, not dropped (membership unknown)
    val withNull = corpus.withColumn("k",
      when(col("id") === 7, lit(null)).otherwise(col("k")))
    val np = Decontaminate.bloomPrune(spark, withNull, "k", keys, "k", 100)
    assert(np.filter(col("id") === 7).count() == 1)
  }

  test("composed decontamination equals the plain exact join") {
    val docs = Tables.documents(spark, sfDir)
    val benchSrc = docs.agg(min(col("source")).as("__bsrc"))
    val tagged = docs.crossJoin(broadcast(benchSrc))
    val benchSh = TextDedup.shingles(
      tagged.filter(col("source") === col("__bsrc")))
      .select("shingle").distinct()
    val corpusSh = TextDedup.shingles(
      tagged.filter(col("source") =!= col("__bsrc")))

    val exact = corpusSh.join(benchSh, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val bloomed = Decontaminate.sharedShingleCounts(spark, corpusSh,
      benchSh, expectedItems = 200000, fpp = 0.01)
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(bloomed == exact)
  }
}
