package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental MinHash near-dup detection against a PERSISTED signature
  * index — the 100 TB shape of corpus dedup. A full-corpus
  * [[TextDedup.minHashNearDups]] re-pairs everything on every run; at a
  * petabyte that is a rescan of the whole archive to admit one day of
  * crawl. This op stores each document's k-wide MinHash signature
  * (k longs — bytes per document, not the document) in a versioned
  * [[Snapshots]] table and, per new batch, generates candidates by
  * banding the BATCH against the index: per bucket the join is
  * O(index-side × batch-side), never O(index²), and only the batch is
  * shingled. The result is bit-identical to running the full pipeline
  * over history ∪ batch and keeping the pairs that touch the batch
  * (the only new pairs a full run could produce — old-old pairs were
  * reported when THEIR batch arrived):
  *
  *  - the index holds exactly history's signature rows, so every bucket
  *    has the same membership (and therefore the same [[SkewGuard]]
  *    cap decision) as the full run's;
  *  - candidate pairs are (all × batch) per bucket, canonicalized —
  *    the full run's candidate set restricted to batch-touching pairs;
  *  - verification is the same exact-Jaccard pass over the documents.
  *
  * The index is a snapshot table: batch commits are atomic and
  * versioned, streaming ingest gets exactly-once via the (writer,
  * batch) manifest tag ([[Snapshots.idempotentAppend]]), and
  * [[Snapshots.compact]] absorbs the small per-batch files.
  *
  * Documents with fewer than n tokens produce no shingles, hence no
  * signature row and no index entry — exactly the full pipeline's
  * behavior (they never band, so they never pair).
  *
  * Reference anchor: the reference's incremental-vs-backfill split
  * (funding_rates_etl.py:38-66) applied to the dedup problem; pure
  * training-data extension.
  */
object DedupIndex {

  /** (doc_id, mh_0..mh_{k-1}) signature rows for `docs` — the index's
    * row format. Stored WITHOUT banding so `bands` stays a query-time
    * choice (any divisor of k) instead of a rebuild. */
  def signatures(docs: DataFrame, k: Int = 16, n: Int = 3): DataFrame =
    TextDedup.minHashSignatures(TextDedup.shingles(docs, n), k)

  /** Initialize (or reset) the index at `dir` from the full corpus.
    * Returns the committed snapshot version. */
  def build(docs: DataFrame, dir: String, k: Int = 16, n: Int = 3): Int =
    Snapshots.overwrite(signatures(docs, k, n), dir)

  /** The banded (doc_id, band_idx, band) rows of a signature frame —
    * the same banding [[TextDedup.lshCandidates]] applies. */
  private def bandRows(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        struct((0 until r).map(i => col(s"mh_${b * r + i}").as(s"v$i")): _*)
      }: _*)).as(Seq("band_idx", "band")))
  }

  /** Near-dup pairs of `batch` against the indexed history AND within
    * the batch, then the batch's signatures are committed to the index.
    *
    * `history` is the document table the index was built over — used
    * only to verify candidate pairs with exact Jaccard (the engine
    * reads just the joined docs; over a doc store kept as a clustered
    * snapshot table, that lookup is [[Snapshots.readWhere]]-prunable).
    * Pass `batchId >= 0` (with a stable `writerId`) from streaming
    * foreachBatch for exactly-once indexing — a replayed batch still
    * RETURNS its pairs but does not double-append.
    *
    * Returns (doc_a, doc_b, jaccard), doc_a < doc_b, every pair
    * touching the batch — bit-identical to the full-run restriction
    * (see object doc). */
  def addBatch(dir: String, batch: DataFrame, history: DataFrame,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.4,
      maxBucket: Int = 10000, n: Int = 3,
      writerId: String = "dedup-index", batchId: Long = -1L): DataFrame = {
    require(bands > 0 && k % bands == 0,
      s"bands ($bands) must divide the signature width ($k)")
    val spark = batch.sparkSession
    // pin the PRE-append index version: the candidate plan below must
    // see exactly history's signatures even after this call commits
    val ver = Snapshots.currentVersion(spark, dir).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no dedup index at $dir — run build() first"))
    val batchSigs = signatures(batch, k, n)
    // a REPLAYED batch (streaming retry) is already in the index: drop
    // its rows from the history side so bucket sizes — and therefore
    // cap decisions and pairs — are identical to the first delivery
    val idxSigs = Snapshots.read(spark, dir, ver)
      .join(batchSigs.select("doc_id"), Seq("doc_id"), "left_anti")
    val banded =
      bandRows(idxSigs, k, bands).withColumn("is_new", lit(false))
        .unionByName(
          bandRows(batchSigs, k, bands).withColumn("is_new", lit(true)))
    // bucket membership == the full run's, so the cap fires identically
    val kept = SkewGuard.capBuckets(banded, Seq("band_idx", "band"),
      maxBucket, minSize = 2)
    val fresh = kept.filter(col("is_new"))
    // materialized eagerly: the pair list is small (bucket-capped) and
    // is read twice — once for its doc ids, once as the verify input —
    // and the verification below must only ever shingle CANDIDATE
    // docs, not the corpus (shingling history to verify a batch would
    // smuggle the full-corpus cost back in)
    val cands = kept.as("x").join(fresh.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band") === col("y.band") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
      .localCheckpoint(true)
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id")))
      .distinct()
    val docs = history.select("doc_id", "text")
      .unionByName(batch.select("doc_id", "text"))
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
    val pairs =
      TextDedup.verifyJaccardArrays(cands, docs, n, threshold)
    if (batchId >= 0L)
      Snapshots.idempotentAppend(batchSigs, dir, writerId, batchId)
    else Snapshots.append(batchSigs, dir)
    pairs
  }
}
