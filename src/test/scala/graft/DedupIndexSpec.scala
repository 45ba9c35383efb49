package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{DedupIndex, Snapshots, TextDedup}

/** Incremental-dedup contract: batch-vs-index detection is bit-identical
  * to the full-corpus run restricted to batch-touching pairs, the index
  * is a versioned snapshot table, and streaming replays neither
  * double-index nor change the reported pairs. */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dedupidx").toFile.toString + "/idx"

  // history: two exact dups (0,1) + distinct docs; batch: a near-dup of
  // doc 0 (cross-batch pair), an exact in-batch dup pair (11,12), and an
  // unrelated doc
  private lazy val history = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely different words about spark window aggregation shuffles and joins"),
    (3L, "yet another unrelated document describing catalyst optimizer rules in depth")
  ).toDF("doc_id", "text")

  private lazy val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (11L, "identical in batch pair of documents planted for the incremental index test"),
    (12L, "identical in batch pair of documents planted for the incremental index test"),
    (13L, "nothing in common with anything else here whatsoever plainly unique tokens")
  ).toDF("doc_id", "text")

  private def fullRestricted = {
    val batchIds = Set(10L, 11L, 12L, 13L)
    TextDedup.minHashNearDups(history.unionByName(batch),
      k = 16, bands = 4, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => batchIds(a) || batchIds(b) }.toSet
  }

  test("addBatch equals the full run restricted to batch-touching pairs") {
    val root = freshRoot()
    DedupIndex.build(history, root)
    val inc = DedupIndex.addBatch(root, batch, history)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == fullRestricted)
    // the planted shapes are actually present: cross-batch near-dup of
    // doc 0/1 and the in-batch exact pair at jaccard 1.0
    assert(inc.exists { case (a, b, _) => a == 0L && b == 10L })
    assert(inc.contains((11L, 12L, 1.0)))
    // old-old pairs (0,1) are NOT re-reported
    assert(!inc.exists { case (a, b, _) => a == 0L && b == 1L })
  }

  test("the index accretes: a later batch pairs against an earlier one") {
    val root = freshRoot()
    DedupIndex.build(history, root)
    DedupIndex.addBatch(root, batch, history).collect()
    val batch2 = Seq(
      (20L, "identical in batch pair of documents planted for the incremental index test"))
      .toDF("doc_id", "text")
    val p2 = DedupIndex.addBatch(root, batch2,
      history.unionByName(batch)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == Set((11L, 20L), (12L, 20L)))
  }

  test("streaming replay: same pairs, no double-indexing") {
    val root = freshRoot()
    DedupIndex.build(history, root)
    val first = DedupIndex.addBatch(root, batch, history,
      writerId = "w1", batchId = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rowsAfterFirst = Snapshots.read(spark, root).count()
    val vAfterFirst = Snapshots.currentVersion(spark, root).get
    val replay = DedupIndex.addBatch(root, batch, history,
      writerId = "w1", batchId = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == first)
    assert(Snapshots.read(spark, root).count() == rowsAfterFirst)
    assert(Snapshots.currentVersion(spark, root).get == vAfterFirst)
  }

  test("sub-shingle docs never enter the index (full-pipeline parity)") {
    val root = freshRoot()
    DedupIndex.build(history, root)
    val tiny = Seq((30L, "two words")).toDF("doc_id", "text")
    DedupIndex.addBatch(root, tiny, history).collect()
    assert(Snapshots.read(spark, root)
      .filter(col("doc_id") === 30L).isEmpty)
  }
}
