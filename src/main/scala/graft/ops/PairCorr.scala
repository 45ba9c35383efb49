package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Budgeted pairwise Pearson correlation between keyed series on a shared
  * time grid — the co-movement matrix a funding monitor screens for
  * correlated rates (reference cadence: the per-symbol series
  * scripts/funding_stats_etl.py:63-120 maintains, crossed).
  *
  * The fan-out hazard: a grid-key self-join emits S·(S−1)/2 pairs per grid
  * point for a universe of S series. Intrinsic to a full correlation
  * matrix and fine at a monitor's universe (~500 symbols), but at an
  * LLM-pipeline-sized universe (10⁴+ series) the intermediate volume is a
  * per-hour near-cartesian. So the pair count is BUDGETED, the same
  * discipline [[SkewGuard.capBuckets]] applies to the dedup self-joins:
  * callers pass `maxPairs`, the op derives the largest series budget whose
  * full matrix fits, keeps the densest series (deterministically:
  * observation count desc, then name — the series a correlation screen
  * wants are the liquid ones), and [[droppedSeries]] reports exactly what
  * a given budget suppresses — capped, never silently truncated.
  *
  * Scale shape: the keep-list is a TakeOrdered over the (small) distinct-
  * series frame, broadcast back as a semi-join — no extra shuffle of the
  * grid frame; the pair pass shuffles once on the grid key and once on the
  * pair key, both with map-side partial aggregation. Float discipline:
  * sums stay exact DECIMAL through the aggregate, then ONE double
  * expression per statistic (IEEE exactly-rounded ops — replays
  * bit-identically against an oracle; no corr() builtin, whose
  * accumulation order is engine-specific).
  */
object PairCorr {

  /** Largest series universe whose full pair matrix S·(S−1)/2 fits in
    * `maxPairs` (≥ 2 so a budget too small for even one pair still
    * degenerates to "no pairs" via the join rather than an error). */
  def seriesBudget(maxPairs: Long): Int = {
    require(maxPairs >= 1, s"maxPairs must be >= 1, got $maxPairs")
    val s = ((1.0 + math.sqrt(1.0 + 8.0 * maxPairs.toDouble)) / 2.0).toLong
    // float guard: step down if rounding overshot the exact bound
    val exact = if (s * (s - 1) / 2 > maxPairs) s - 1 else s
    math.max(2L, exact).min(Int.MaxValue.toLong).toInt
  }

  /** Deterministic keep-list for a series budget: the `budget` series
    * with the most grid observations, ties broken by name ascending.
    * One column-pruned aggregate + TakeOrdered over the distinct-series
    * frame — never a full sort of the grid. */
  def keepSeries(grid: DataFrame, seriesCol: String, budget: Int): DataFrame =
    grid.groupBy(seriesCol)
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col(seriesCol).asc)
      .limit(budget)
      .select(seriesCol)

  /** Observability companion ([[SkewGuard.oversizedBuckets]] pattern):
    * the series (with observation counts) a given `maxPairs` budget
    * WOULD drop, densest first. Run when a correlation screen returns
    * fewer series than expected, to see what the budget suppressed. */
  def droppedSeries(grid: DataFrame, seriesCol: String,
      maxPairs: Long): DataFrame = {
    val keep = keepSeries(grid, seriesCol, seriesBudget(maxPairs))
    grid.groupBy(seriesCol)
      .agg(count(lit(1)).as("n_obs"))
      .join(keep, Seq(seriesCol), "left_anti")
      .orderBy(col("n_obs").desc, col(seriesCol).asc)
  }

  /** Pairwise Pearson correlation over `grid` — one row per
    * (seriesCol, gridCol) with an exact-decimal `valueCol` — for every
    * kept pair (a < b) observed on ≥ `minOverlap` shared grid points.
    * Output: (sym_a, sym_b, n_hours, corr); zero-variance series yield
    * NULL corr, not a division error. Pair volume ≤ `maxPairs` by the
    * series budget above. */
  def pearsonPairs(grid: DataFrame, seriesCol: String, gridCol: String,
      valueCol: String, maxPairs: Long, minOverlap: Long): DataFrame = {
    val keep = broadcast(keepSeries(grid, seriesCol,
      seriesBudget(maxPairs)))
    val kept = grid.join(keep, Seq(seriesCol), "left_semi")
    val a = kept.select(col(seriesCol).as("sym_a"),
      col(gridCol).as("__g"), col(valueCol).as("va"))
    val b = kept.select(col(seriesCol).as("sym_b"),
      col(gridCol).as("__g"), col(valueCol).as("vb"))
    val sums = a.join(b, Seq("__g"))
      .filter(col("sym_a") < col("sym_b"))
      .groupBy("sym_a", "sym_b")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("va")).cast("double").as("sx"),
        sum(col("vb")).cast("double").as("sy"),
        sum(col("va") * col("vb")).cast("double").as("sxy"),
        sum(col("va") * col("va")).cast("double").as("sxx"),
        sum(col("vb") * col("vb")).cast("double").as("syy"))
    val den = sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
      sqrt(col("n") * col("syy") - col("sy") * col("sy"))
    sums
      .filter(col("n") >= minOverlap.toDouble)
      .select(col("sym_a"), col("sym_b"),
        col("n").cast("long").as("n_hours"),
        when(den > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / den)
          .as("corr"))
  }
}
