package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered membership pruning — the shuffle eliminator for
  * "100 TB corpus vs 10M-key reference set" joins (decontamination
  * against eval benchmarks, blocklist scrubbing, id-set retention).
  *
  * The reference set is often too large to broadcast-hash-join (tens of
  * millions of shingles) but its Bloom filter is a few MB: build the
  * filter distributed (one aggregation over the SMALL side), broadcast
  * it, and drop non-members of the BIG side at the scan — before the
  * shuffle. Only the surviving sliver (true matches + fpp false
  * positives) pays the exact join that keeps the final answer EXACT.
  * At fpp 1% a decontamination pass shuffles ~1% of the corpus instead
  * of all of it; results are bit-identical to the plain join.
  *
  * The membership probe is a Scala UDF by design exception (SURVEY
  * §2.10): it is a scan-side prune whose output never changes the
  * query result, and the per-row cost is two xxhash probes — the
  * codegen loss is paid once per scanned row in exchange for removing
  * the corpus-sized shuffle, the dominant term at scale.
  */
object Decontaminate {

  /** Rows of `df` whose `colName` MIGHT be in `keys(keyCol)`: a
    * guaranteed superset of the true members (Bloom filters have no
    * false negatives), compact enough to shuffle. `expectedItems`/`fpp`
    * size the filter (~ -n·ln(fpp)/ln(2)² bits ≈ 1.2 MB per million
    * keys at 1%). NULL probes are kept (membership unknown — the exact
    * confirm decides). */
  def bloomPrune(spark: SparkSession, df: DataFrame, colName: String,
      keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val might = udf((s: String) => s == null || bcast.value.mightContainString(s))
    df.filter(might(col(colName).cast("string")))
  }

  /** Exact shared-key counts per document, Bloom-pruned: for each
    * corpus doc, how many of its distinct shingles appear in the
    * benchmark shingle set — identical output to the unpruned
    * join-and-count, minus the corpus-wide shuffle. Inputs are
    * (doc_id, shingle) / (shingle) frames (see TextDedup.shingles). */
  def sharedShingleCounts(spark: SparkSession, corpusShingles: DataFrame,
      benchShingles: DataFrame, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bench = benchShingles.select("shingle").distinct()
    bloomPrune(spark, corpusShingles, "shingle", bench, "shingle",
      expectedItems, fpp)
      .join(bench, Seq("shingle"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }
}
