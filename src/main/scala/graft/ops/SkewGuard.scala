package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared oversized-bucket guard for the LSH candidate self-joins
  * ([[TextDedup]] minhash/simhash banding, [[Similarity]] vector
  * buckets): a bucket's pair count is quadratic in its size, so one
  * degenerate bucket (identical-template corpus) dominates the whole
  * job. One implementation so the cap semantics can't drift between the
  * call sites.
  */
object SkewGuard {

  /** Keep only rows whose bucket — the combination of `keys` — has
    * between `minSize` and `maxBucket` members. `minSize = 2` also
    * prunes singleton buckets (which cannot produce a pair) before the
    * self-join; pass 1 where every row must stay eligible (e.g.
    * multi-probe, where a singleton still probes other buckets). The
    * size aggregate shuffles only the key columns (column pruning) and
    * the keep-list join broadcasts when small. */
  def capBuckets(df: DataFrame, keys: Seq[String], maxBucket: Int,
      minSize: Int = 1): DataFrame = {
    val keep = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") >= minSize && col("__bsz") <= maxBucket)
      .select(keys.map(col): _*)
    df.join(keep, keys)
  }

  /** Observability companion to [[capBuckets]]: the bucket keys (with
    * sizes) a given cap WOULD drop. The cap itself never pays for this —
    * run it as a separate diagnostic when a dedup pass returns
    * suspiciously few pairs, to see which template/boilerplate clusters
    * were suppressed and how big they are. */
  def oversizedBuckets(df: DataFrame, keys: Seq[String],
      maxBucket: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)
      .orderBy(col("bucket_size").desc)

  /** Pre-shuffle skew diagnostic: the `topK` heaviest values of `keys`
    * with exact counts and their share of the table — the report to run
    * BEFORE keying a 100 TB join/groupBy on a column, because one key
    * holding 10% of the rows means one straggler task holding 10% of
    * the shuffle (the situation AQE skew-join and salting exist for).
    *
    * Exact by design, not a sketch: the count is one map-side-combined
    * hash aggregate (shuffles one row per distinct key per task, never
    * the data), top-k is a TakeOrdered over the counts, and the total
    * is a broadcast scalar — so the report is deterministic and
    * oracle-replayable. Ties break by key value ascending. NULL keys
    * count as a value (often the heaviest — exactly what this report
    * exists to catch). */
  def keySkew(df: DataFrame, keys: Seq[String], topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"))
    val total = df.agg(count(lit(1)).cast("long").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        col("n_rows").cast("double") / col("__total").cast("double"))
      .drop("__total")
      .orderBy(col("n_rows").desc +: keys.map(k => col(k).asc_nulls_first): _*)
      .limit(topK)
  }
}
