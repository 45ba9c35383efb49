package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSparkBridge
import org.apache.spark.sql.types.{BinaryType, StringType}

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
  * Both sides of the probe are Spark's own CODEGEN'D Bloom expressions
  * — [[BloomFilterAggregate]] builds the filter distributed with
  * map-side partials, and [[BloomFilterMightContain]] (the expression
  * behind runtime row-level filtering) tests each corpus row inside
  * whole-stage codegen; the serialized filter ships as a literal, the
  * exact mechanism Spark's own injected runtime filters use. No Scala
  * UDF remains in the hot path. Values hash through `xxhash64` of the
  * string form on BOTH sides, so the probe is a guaranteed superset
  * of true members.
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
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"invalid bloom sizing: items=$expectedItems fpp=$fpp")
    // the classic sizing: m = -n ln(p) / ln(2)^2 — CLAMPED to Spark's
    // BloomFilterAggregate ceilings (the aggregate enforces the same
    // session confs Spark's own runtime row-filters size under; an
    // out-of-range request would refuse or silently degrade there).
    // A clamp only RAISES the realized fpp: the probe stays a
    // guaranteed superset and the exact confirm join keeps the final
    // answer exact — operators sizing past the ceiling should raise
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits/maxNumItems.
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        "67108864").toLong
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        "4000000").toLong
    val items = math.min(expectedItems, maxItems)
    val numBits = math.min(maxBits, math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong))
    def hashed(name: String) = new XxHash64(Seq(
      Cast(UnresolvedAttribute.quoted(name), StringType)))
    val bytes = keys
      .select(GraftSparkBridge.column(
        new BloomFilterAggregate(hashed(keyCol),
          Literal(items), Literal(numBits))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    // an empty key set aggregates to NULL — nothing can match
    if (bytes == null) return df.filter(col(colName).isNull)
    val probe = GraftSparkBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), hashed(colName)))
    df.filter(col(colName).isNull || probe)
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
