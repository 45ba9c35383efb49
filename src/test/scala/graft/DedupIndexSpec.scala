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

  test("streaming ingest: corpus + index + pairs advance exactly-once") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("dedupidx-stream")
    val src = Files.createDirectory(base.resolve("src"))
    val corpus = s"$base/corpus"; val idx = s"$base/idx"
    val pairsT = s"$base/pairs"; val ckpt = s"$base/ckpt"
    DedupIndex.build(history, idx)
    Snapshots.append(history, corpus)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def writeFile(n: Int, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempFile("stage", ".json")
      Files.writeString(tmp, rows.map { case (i, t) =>
        s"""{"doc_id":$i,"text":"$t"}""" }.mkString("\n"))
      Files.move(tmp, src.resolve(f"b$n%03d.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(src.toString)
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // history = the corpus BEFORE this batch lands (addBatch's
        // contract: history and batch disjoint on doc_id)
        val hist = Snapshots.read(df.sparkSession, corpus)
        val pairs = DedupIndex.addBatch(idx, df, hist,
          writerId = "stream-idx", batchId = batchId)
        Snapshots.idempotentAppend(pairs, pairsT, "stream-pairs", batchId)
        Snapshots.idempotentAppend(df, corpus, "stream-corpus", batchId)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    writeFile(1, Seq(
      (40L, "the quick brown fox jumps over the lazy dog near the river bank tonight")))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    // restart with a batch that dups BATCH 1's doc — found via the index
    writeFile(2, Seq(
      (41L, "the quick brown fox jumps over the lazy dog near the river bank tonight")))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val got = Snapshots.read(spark, pairsT)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 40 pairs with history's 0/1 near-dups AND doc 41 pairs with 40
    assert(got.contains((0L, 40L)) && got.contains((40L, 41L)))
    // each pair reported exactly once across batches + restart
    assert(Snapshots.read(spark, pairsT).count() ==
      Snapshots.read(spark, pairsT).distinct().count())
  }
}
