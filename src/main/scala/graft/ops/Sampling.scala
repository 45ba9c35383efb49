package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Reproducible dataset splitting/sampling for training pipelines.
  *
  * `df.sample()`/`randomSplit()` are NOT reproducible at scale: their
  * row→random-draw pairing depends on partition layout, so the same call
  * over the same data can yield different train/eval sets after a
  * repartition, a file compaction, or an engine upgrade. Hash-based
  * assignment derives each row's bucket from a KEY (md5, engine-portable
  * — [[TextFns.hash60]]), making splits a pure function of the data:
  * stable across layouts, engines and time, and consistent for every row
  * of the same key (no train/eval leakage for multi-row entities).
  */
object Sampling {

  /** Deterministic bucket 0..99 for a key column. */
  def hashBucket(key: Column): Column =
    pmod(TextFns.hash60(key.cast("string")), lit(100L))

  /** Keep rows whose key hashes into [lo, hi) of 100 buckets — e.g.
    * (df, key, 0, 80) = the 80% train split, (.., 80, 100) = eval;
    * the two are disjoint and exhaustive by construction. */
  def hashSplit(df: DataFrame, key: Column, lo: Int, hi: Int): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 100, s"need 0 <= $lo < $hi <= 100")
    df.filter(hashBucket(key) >= lo && hashBucket(key) < hi)
  }

  /** 2^60 as an (exactly representable) double — the denominator turning
    * [[TextFns.hash60]] into a uniform draw in (0, 1]. */
  private val TwoPow60 = 1152921504606846976L

  /** Duffield–Lund–Thorup priority of a row: weight / u, where
    * u = (hash60(key)+1) / 2^60 is a reproducible uniform in (0, 1].
    * Keeping the k highest-priority rows is a weighted sample without
    * replacement whose inclusion probabilities track the weights — and
    * because u is hash-derived, the SAME rows are picked across
    * partitionings, engines and reruns (unlike rand()-keyed sampling).
    *
    * Float discipline (oracle parity): only +, / and long→double
    * conversions — all exactly-rounded IEEE ops, bit-identical across
    * engines. No pow/ln (their last-bit rounding is libm-specific).
    */
  def priority(key: Column, weight: Column): Column = {
    val u = (TextFns.hash60(key.cast("string")) + lit(1L)).cast("double") /
      lit(TwoPow60).cast("double")
    weight.cast("double") / u
  }

  /** Top-k weighted sample per stratum (global sample: constant stratum).
    * One shuffle on the stratum; the per-stratum top-k is the same
    * windowed rank TopK.perGroup uses, so skewed strata degrade to a
    * bounded sort, never a global one. Ties (equal priority) break on
    * the key for a total order. */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
      stratum: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(priority(key, weight).desc, key.asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
