package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranks without a single-task sort. A window function
  * with an empty PARTITION BY (`row_number() OVER (ORDER BY ...)`,
  * `ntile(...)`) is exact but collapses the whole table into ONE
  * window partition — one task sorts 100 TB, the canonical scale
  * cliff. This op gets the same exact answer from fully-parallel
  * stages, the distributed-zipWithIndex recipe:
  *
  *  1. range-repartition on the sort key (parallel sampling pass
  *     picks boundaries; equal keys co-locate, ranges ascend with
  *     partition id),
  *  2. count rows per partition — numPartitions longs to the driver,
  *     prefix-summed into per-partition rank offsets,
  *  3. intra-partition `row_number` (each window partition is one
  *     physical partition's worth, never the table) + the broadcast
  *     offset = the exact global rank.
  *
  * Cost: two shuffles of the frame (range + the window's hash on the
  * partition id), one executor-local materialization of the ranged
  * frame (pinning the range boundaries — see rankedWithTotal), and a
  * numPartitions-row collect, every stage 32-way (or 1000-executor)
  * parallel. Determinism: callers must pass a
  * TOTAL order (tie-break to a unique column) — the rank of a tied
  * row would otherwise depend on boundary placement.
  *
  * [[exactNtile]] derives the standard NTILE bucket from the rank in
  * closed form, so curriculum binning / decile reporting at 100 TB
  * never pays the global-window cliff.
  */
object Ranking {

  /** (df + rankCol, total row count) — the count is free, it is the
    * last prefix-sum offset. */
  private def rankedWithTotal(df: DataFrame, sortCols: Seq[Column],
      rankCol: String, numPartitions: Int): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "globalRank needs at least one sort column")
    val np = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val pid = "__graft_pid"
    // localCheckpoint PINS the range partitioning: the count job below
    // and the caller's rank job otherwise each re-execute
    // repartitionByRange, and RangePartitioner boundaries come from a
    // per-job sample — once partitions exceed the sample size the two
    // jobs can split boundary rows differently, so the broadcast offsets
    // would disagree with the rank job's partition counts (duplicated /
    // skipped global ranks). Materializing once makes both jobs read the
    // IDENTICAL partitions; a lost executor block fails the job loudly
    // (recompute could re-sample) instead of silently mis-ranking.
    val ranged = df.repartitionByRange(np, sortCols: _*)
      .localCheckpoint(eager = true)
      .withColumn(pid, spark_partition_id())
    // numPartitions longs to the driver — the only driver-side data
    val counts = ranged.groupBy(col(pid)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until np).scanLeft(0L) {
      (acc, p) => acc + counts.getOrElse(p, 0L)
    } // offsets(p) = rows in partitions < p; offsets(np) = total
    val offsetExpr = element_at(
      array(offsets.take(np).map(lit): _*), col(pid) + 1)
    val ranked = ranged
      .withColumn(rankCol,
        row_number().over(
          Window.partitionBy(col(pid)).orderBy(sortCols: _*))
          .cast("long") + offsetExpr)
      .drop(pid)
    (ranked, offsets(np))
  }

  /** `df` plus `rankCol` = exact 1-based global rank under
    * `sortCols` (must be a total order for determinism). */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rank", numPartitions: Int = 0): DataFrame =
    rankedWithTotal(df, sortCols, rankCol, numPartitions)._1

  /** `df` plus `bucketCol` = exact NTILE(`buckets`) bucket (1-based)
    * under `sortCols`, bit-identical to
    * `ntile(buckets) OVER (ORDER BY sortCols)` but with no global
    * window: with n rows, the first n mod buckets buckets hold
    * ⌈n/buckets⌉ rows and the rest ⌊n/buckets⌋ — derived from the
    * global rank in closed form. (floor-of-double division is exact
    * below 2^53 rows — twelve orders past 100 TB row counts.) */
  def exactNtile(df: DataFrame, buckets: Int, sortCols: Seq[Column],
      bucketCol: String = "bucket"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val rankCol = "__graft_rank"
    val (ranked, total) = rankedWithTotal(df, sortCols, rankCol, 0)
    val q = lit(total / buckets)
    val rem = lit(total % buckets)
    val r0 = col(rankCol) - 1 // 0-based rank
    val bucket =
      when(lit(total % buckets) === 0L,
        floor(r0 / greatest(q, lit(1L))) + 1)
        .when(r0 < rem * (q + 1), floor(r0 / (q + 1)) + 1)
        .otherwise(rem + floor((r0 - rem * (q + 1)) / q) + 1)
    ranked.withColumn(bucketCol, bucket.cast("long")).drop(rankCol)
  }
}
