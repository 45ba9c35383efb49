package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollups — the append-only 100 TB story.
  *
  * A grand-total rollup over a growing fact table must not rescan
  * history on every batch: at 100 TB the history scan IS the cost.
  * The classic fix is an algebraic partial-aggregate state table —
  * exactly the (count, sum, min, max) tuples Spark's own partial
  * aggregation exchanges between map and reduce, made durable:
  *
  *   state ⊕ partial(new batch) == partial(history ∪ new batch)
  *
  * so each batch pays only its own scan plus a state-sized merge (the
  * state has one row per group — MB where the facts are TB). AVG and
  * other derived measures are NOT stored (they don't merge); they are
  * computed at read time from the mergeable accumulators by
  * [[finalize]].
  *
  * Determinism contract (repo-wide): sums accumulate in DECIMAL(38,4)
  * — exact, engine-replayable, overflow-safe for ~10²⁰ rows of
  * DECIMAL(18,4) values; the only double arithmetic is in [[finalize]]
  * (one cast-and-divide per derived measure). The merge is therefore
  * associative AND commutative bit-for-bit — batch order, partition
  * layout and merge tree shape cannot change the state, which is what
  * makes the oracle's single-scan replay a fair hash-compare.
  *
  * Reference anchor: the funding-stats rebuild
  * (funding_stats_etl.py:63-120 recomputes from the full table each
  * tick) — this op is the form that survives when the table no longer
  * fits a tick.
  */
object IncrementalAgg {

  private val accCols = Seq("n", "sum_val", "min_val", "max_val", "nd_sketch")

  /** Mergeable state for one batch: per-group (n, sum, min, max) over
    * `value`. Map-side combine applies (hash partial aggregate), so a
    * batch shuffles one row per group per task, not its rows.
    *
    * `distinctCol` adds an `nd_sketch` HLL accumulator (DataSketches
    * HLL_4, the engine's own codegen'd sketch) tracking APPROXIMATE
    * per-group distinct counts of that column — the one aggregate a
    * (count, sum, min, max) tuple cannot carry, because exact distinct
    * does not merge without the full value set. HLL registers merge by
    * per-bucket max: associative, commutative, and replay-idempotent
    * (re-merging the same batch's sketch cannot move the estimate), so
    * batch order and merge-tree shape cannot change the state's
    * estimate — the property that makes it legal in incremental state
    * at all. Estimate error is ~1.6% rel. std. at the default
    * lgConfigK=12; the state cost is ≤ 2^12 registers per group. */
  def partial(batch: DataFrame, keys: Seq[String], value: String,
      distinctCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "incremental rollup needs >= 1 group key")
    val v = col(value).cast("decimal(18,4)")
    val base = Seq(
      count(lit(1)).cast("long").as("n"),
      sum(v).cast("decimal(38,4)").as("sum_val"),
      min(v).as("min_val"),
      max(v).as("max_val"))
    val aggs = base ++ distinctCol.map(d => hll_sketch_agg(col(d)).as("nd_sketch"))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `state ⊕ delta`: group keys are every column that is not an
    * accumulator, so any [[partial]] output merges without re-stating
    * its key list. Both sides are state-sized — this never touches the
    * fact table. Sketch accumulators (if present on both sides) union
    * register-wise. */
  def merge(state: DataFrame, delta: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(accCols.contains).toSeq
    require(keys.sorted.sameElements(
      delta.columns.filterNot(accCols.contains).sorted),
      s"state/delta key mismatch: ${state.columns.toSeq} vs ${delta.columns.toSeq}")
    val hasSketch = state.columns.contains("nd_sketch")
    require(hasSketch == delta.columns.contains("nd_sketch"),
      "state and delta disagree on the nd_sketch accumulator — " +
        "distinctCol must be used consistently from the first batch")
    val base = Seq(
      sum(col("n")).cast("long").as("n"),
      sum(col("sum_val")).cast("decimal(38,4)").as("sum_val"),
      min(col("min_val")).as("min_val"),
      max(col("max_val")).as("max_val"))
    val aggs =
      if (hasSketch) base :+ hll_union_agg(col("nd_sketch")).as("nd_sketch")
      else base
    state.unionByName(delta)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** One exactly-once batch advance of a DURABLE rollup: the state
    * lives in a [[Snapshots]] table, each advance commits
    * `merge(current state, partial(batch))` as a new version tagged
    * with (writerId, batchId) — so a replayed batch (task retry,
    * driver restart, foreachBatch recovery) is recognized and skipped
    * instead of double-counted, and every historical state version
    * stays time-travel-readable. Returns None on a skipped replay.
    *
    * This is the full 100 TB incremental pipeline in one call: the
    * batch pays its own scan + a state-sized merge + a state-sized
    * write; the fact history is never touched. The state table must
    * have ONE writer (the stream that owns it): advance reads then
    * overwrites, and overwrite is last-writer-wins — concurrent
    * writers to the same state dir would drop each other's merges. */
  def advanceVersioned(stateDir: String, batch: DataFrame,
      keys: Seq[String], value: String, writerId: String,
      batchId: Long, distinctCol: Option[String] = None): Option[Int] = {
    val spark = batch.sparkSession
    val delta = partial(batch, keys, value, distinctCol)
    val next = Snapshots.currentVersion(spark, stateDir) match {
      case None => delta
      case Some(v) => merge(Snapshots.read(spark, stateDir, v), delta)
    }
    Snapshots.idempotentOverwrite(next, stateDir, writerId, batchId)
  }

  /** Read-time derived measures over the state: exact sums surfaced as
    * doubles (one cast each) plus the non-mergeable AVG (one division);
    * a sketch accumulator surfaces as its `approx_distinct` estimate.
    * The state itself stays exact — finalize is a view, not a step. */
  def finalize(state: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(accCols.contains).toSeq
    val base = Seq(
      col("n"),
      col("sum_val").cast("double").as("sum_value"),
      (col("sum_val").cast("double") /
        col("n").cast("double")).as("avg_value"),
      col("min_val").cast("double").as("min_value"),
      col("max_val").cast("double").as("max_value"))
    val derived =
      if (state.columns.contains("nd_sketch"))
        base :+ hll_sketch_estimate(col("nd_sketch")).as("approx_distinct")
      else base
    state.select(keys.map(col) ++ derived: _*)
  }
}
