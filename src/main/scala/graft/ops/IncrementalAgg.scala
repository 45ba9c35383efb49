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

  private val accCols =
    Seq("n", "sum_val", "min_val", "max_val", "nd_sketch",
      "mg_sketch", "kll_sketch")

  /** Default Misra-Gries capacity when `heavyHitterCol` is used. */
  val DefaultHhK = 16
  /** Default KLL accuracy parameter when `quantileK` is enabled. */
  val DefaultKllK = 200

  private def mgAgg(k: Int) = org.apache.spark.sql.functions.udaf(
    new FreqSketch.MisraGries(k), org.apache.spark.sql.Encoders.STRING)
  private def mgMergeAgg(k: Int) = org.apache.spark.sql.functions.udaf(
    new FreqSketch.MergeSummaries(k),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[FreqSketch.Summary]())
  private def kllMergeAgg(k: Int) = org.apache.spark.sql.functions.udaf(
    new QuantileSketch.MergeKll(k), org.apache.spark.sql.Encoders.BINARY)

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
    * lgConfigK=12; the state cost is ≤ 2^12 registers per group.
    *
    * `heavyHitterCol` adds an `mg_sketch` accumulator — a per-group
    * [[FreqSketch]] Misra-Gries summary (≤ `heavyHitterK` counters) of
    * that column, carrying per-group TOP ITEMS through the state with
    * the mergeable n/(k+1) bound. `quantileK > 0` adds a `kll_sketch`
    * accumulator — a per-group serialized [[QuantileSketch]] over
    * `value`, carrying per-group QUANTILES (±~1.65% rank at k=200).
    * Both merge associatively, so a CDC-fed rollup advances top-k and
    * percentiles per batch without ever rescanning history — the two
    * read-time aggregates (a t17-style token report, a t18-style
    * length distribution) that previously forced a full pass. */
  def partial(batch: DataFrame, keys: Seq[String], value: String,
      distinctCol: Option[String] = None,
      heavyHitterCol: Option[String] = None, heavyHitterK: Int = DefaultHhK,
      quantileK: Int = 0): DataFrame = {
    require(keys.nonEmpty, "incremental rollup needs >= 1 group key")
    val v = col(value).cast("decimal(18,4)")
    val base = Seq(
      count(lit(1)).cast("long").as("n"),
      sum(v).cast("decimal(38,4)").as("sum_val"),
      min(v).as("min_val"),
      max(v).as("max_val"))
    val aggs = base ++
      distinctCol.map(d => hll_sketch_agg(col(d)).as("nd_sketch")) ++
      heavyHitterCol.map(h =>
        mgAgg(heavyHitterK)(col(h).cast("string")).as("mg_sketch"))
    val agg = batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (quantileK <= 0) agg
    else agg.join( // both sides are group-sized — never the batch rows
      QuantileSketch.groupedPartials(batch, keys, value, quantileK), keys)
  }

  /** `state ⊕ delta`: group keys are every column that is not an
    * accumulator, so any [[partial]] output merges without re-stating
    * its key list. Both sides are state-sized — this never touches the
    * fact table. Sketch accumulators (if present on both sides) union
    * register-wise / summary-wise; `heavyHitterK` must be the k the
    * summaries were built with. */
  def merge(state: DataFrame, delta: DataFrame,
      heavyHitterK: Int = DefaultHhK,
      quantileK: Int = DefaultKllK): DataFrame = {
    val keys = state.columns.filterNot(accCols.contains).toSeq
    require(keys.sorted.sameElements(
      delta.columns.filterNot(accCols.contains).sorted),
      s"state/delta key mismatch: ${state.columns.toSeq} vs ${delta.columns.toSeq}")
    def consistent(c: String, what: String): Boolean = {
      val has = state.columns.contains(c)
      require(has == delta.columns.contains(c),
        s"state and delta disagree on the $c accumulator — " +
          s"$what must be used consistently from the first batch")
      has
    }
    val hasSketch = consistent("nd_sketch", "distinctCol")
    val hasMg = consistent("mg_sketch", "heavyHitterCol")
    val hasKll = consistent("kll_sketch", "quantileK")
    val base = Seq(
      sum(col("n")).cast("long").as("n"),
      sum(col("sum_val")).cast("decimal(38,4)").as("sum_val"),
      min(col("min_val")).as("min_val"),
      max(col("max_val")).as("max_val"))
    val aggs = base ++
      (if (hasSketch) Seq(hll_union_agg(col("nd_sketch")).as("nd_sketch"))
       else Nil) ++
      (if (hasMg)
        Seq(mgMergeAgg(heavyHitterK)(col("mg_sketch")).as("mg_sketch"))
       else Nil) ++
      (if (hasKll)
        Seq(kllMergeAgg(quantileK)(col("kll_sketch")).as("kll_sketch"))
       else Nil)
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
      batchId: Long, distinctCol: Option[String] = None,
      heavyHitterCol: Option[String] = None,
      heavyHitterK: Int = DefaultHhK, quantileK: Int = 0): Option[Int] = {
    val spark = batch.sparkSession
    val delta = partial(batch, keys, value, distinctCol,
      heavyHitterCol, heavyHitterK, quantileK)
    val next = Snapshots.currentVersion(spark, stateDir) match {
      case None => delta
      case Some(v) => merge(Snapshots.read(spark, stateDir, v), delta,
        heavyHitterK, if (quantileK > 0) quantileK else DefaultKllK)
    }
    Snapshots.idempotentOverwrite(next, stateDir, writerId, batchId)
  }

  /** Read-time derived measures over the state: exact sums surfaced as
    * doubles (one cast each) plus the non-mergeable AVG (one division);
    * a sketch accumulator surfaces as its `approx_distinct` estimate.
    * An MG accumulator passes through as the `top_items` map (item →
    * estimated count, the n/(k+1) bound semantics of [[FreqSketch]]);
    * a KLL accumulator passes through as `kll_sketch` bytes — read
    * quantiles out with [[QuantileSketch.quantilesOf]] (the readout is
    * a driver-side decode of KB-sized state, not a data pass). The
    * state itself stays exact — finalize is a view, not a step. */
  def finalize(state: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(accCols.contains).toSeq
    val base = Seq(
      col("n"),
      col("sum_val").cast("double").as("sum_value"),
      (col("sum_val").cast("double") /
        col("n").cast("double")).as("avg_value"),
      col("min_val").cast("double").as("min_value"),
      col("max_val").cast("double").as("max_value"))
    val derived = base ++
      (if (state.columns.contains("nd_sketch"))
        Seq(hll_sketch_estimate(col("nd_sketch")).as("approx_distinct"))
       else Nil) ++
      (if (state.columns.contains("mg_sketch"))
        Seq(col("mg_sketch").as("top_items")) else Nil) ++
      (if (state.columns.contains("kll_sketch"))
        Seq(col("kll_sketch")) else Nil)
    state.select(keys.map(col) ++ derived: _*)
  }
}
