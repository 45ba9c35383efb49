package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
