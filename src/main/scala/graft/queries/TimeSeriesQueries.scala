package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.PairCorr

/** Time-series analytics over the `events` stream: regular-grid resampling
  * with forward fill, and cohort retention — the two time-shaped workloads a
  * funding/usage monitor runs beyond the trailing windows FundingStats
  * already covers (reference cadence: scripts/funding_stats_etl.py:63-120's
  * per-symbol rolling loop; the grid/retention shapes generalize it).
  *
  * Scale shape: both queries shuffle ONCE on their natural key (symbol /
  * user_id) and aggregate from there; the resample grid is generated
  * per-symbol with `sequence` + `explode` (no cross join, no driver loop),
  * so grid size is symbols × hours regardless of corpus row count.
  */
object TimeSeriesQueries {

  /** Resample window: one week of the fixtures' Jan-2024 range. Fixed
    * literals keep the query deterministic vs the oracle (FIXTURES.md
    * determinism rules — same reasoning as FundingStats.AnchorDate). */
  private val GridStart = "2024-01-10 00:00:00"
  private val GridEnd = "2024-01-16 23:00:00"

  val all: Seq[QueryDef] = Seq(

    // g1: hourly-grid forward-fill resample of the funding-rate series.
    // Union the RAW observations with the generated grid rows, then ONE
    // window pass per symbol carries the last at-or-before rate onto each
    // grid point. Ordering (ts, is_grid, rate) makes the pass subsume the
    // duplicate-timestamp collapse too: at equal ts, observations sort
    // before the grid row and ascending rate puts the max last, so
    // `last(rate, ignoreNulls)` IS max-of-latest-ts — no separate
    // groupBy(symbol, ts) pre-aggregation, which would shuffle the big
    // events side a second time (measured: 4 exchanges → 3; the data
    // path crosses the wire once, on symbol).
    QueryDef("g1_gapfill_ffill",
      (s, dir) => {
        val obs = Tables.events(s, dir)
          .select(
            concat(lit("SYM"), (col("user_id") % 20).cast("string"),
              lit("USDTM")).as("symbol"),
            col("ts"),
            (col("value") / 10000.0).as("rate"))
        val grid = obs.select("symbol").distinct()
          .withColumn("ts", explode(expr(
            s"sequence(timestamp'$GridStart', timestamp'$GridEnd', " +
              "interval 1 hour)")))
        val unioned = obs.withColumn("is_grid", lit(0))
          .unionByName(grid
            .withColumn("rate", lit(null).cast("double"))
            .withColumn("is_grid", lit(1)))
        val w = Window.partitionBy("symbol")
          .orderBy(col("ts").asc, col("is_grid").asc, col("rate").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned
          .withColumn("rate_ff", last("rate", ignoreNulls = true).over(w))
          .filter(col("is_grid") === 1)
          .select("symbol", "ts", "rate_ff")
          .orderBy("symbol", "ts")
      },
      s"""WITH obs AS (
         |  SELECT 'SYM' || CAST(user_id % 20 AS VARCHAR) || 'USDTM' AS symbol,
         |    CAST(ts AS TIMESTAMP) AS ts, max(value / 10000.0) AS rate
         |  FROM events GROUP BY 1, 2),
         |grid AS (
         |  SELECT s.symbol, g.ts
         |  FROM (SELECT DISTINCT symbol FROM obs) s
         |  CROSS JOIN (SELECT unnest(generate_series(
         |    TIMESTAMP '$GridStart', TIMESTAMP '$GridEnd',
         |    INTERVAL 1 HOUR)) AS ts) g),
         |u AS (
         |  SELECT symbol, ts, rate, 0 AS is_grid FROM obs
         |  UNION ALL
         |  SELECT symbol, ts, NULL, 1 FROM grid),
         |f AS (
         |  SELECT symbol, ts, is_grid,
         |    last_value(rate IGNORE NULLS) OVER (PARTITION BY symbol
         |      ORDER BY ts ASC, is_grid ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rate_ff
         |  FROM u)
         |SELECT symbol, ts, rate_ff FROM f WHERE is_grid = 1
         |ORDER BY symbol, ts""".stripMargin),

    // g2: weekly cohort retention. Cohort = ISO week of a user's first
    // event; each (cohort, offset) cell counts the distinct users active
    // that many weeks later. Both aggregations and the join key on
    // user_id — one shuffle key end-to-end until the final small
    // (cohorts × offsets) rollup. Week offsets divide exactly because
    // both sides are Monday-truncated timestamps.
    QueryDef("g2_retention_cohorts",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        val cohorts = e.groupBy("user_id").agg(min("w").as("cohort_week"))
        e.join(cohorts, "user_id")
          .groupBy(col("cohort_week"),
            ((unix_timestamp(col("w")) - unix_timestamp(col("cohort_week")))
              / lit(604800L)).cast("long").as("week_offset"))
          .agg(countDistinct("user_id").as("users"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH e AS (
        |  SELECT user_id,
        |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS w
        |  FROM events),
        |c AS (SELECT user_id, min(w) AS cohort_week FROM e GROUP BY 1)
        |SELECT cohort_week,
        |  (CAST(epoch(w) AS BIGINT) - CAST(epoch(cohort_week) AS BIGINT))
        |    // 604800 AS week_offset,
        |  count(DISTINCT e.user_id) AS users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin),

    // g3: rolling z-score anomaly detection — flag observations more than
    // 2.5 sample standard deviations from their trailing 24-row per-symbol
    // mean (the monitor's "this funding rate just spiked" alert, batch
    // form). One shuffle on symbol; mean and variance come from the SAME
    // window frame via sum/sum-of-squares, so adding the variance costs
    // no extra pass. Float discipline: sums stay exact DECIMAL inside the
    // frame, then ONE double expression per statistic (+,-,*,/ and sqrt
    // are all exactly-rounded IEEE ops, so z replays bit-identically;
    // no stddev_samp — its accumulation order is engine-specific).
    QueryDef("g3_zscore_anomaly",
      (s, dir) => {
        val raw = Tables.events(s, dir)
          .select(
            concat(lit("SYM"), (col("user_id") % 20).cast("string"),
              lit("USDTM")).as("symbol"),
            col("ts"), col("value").cast("decimal(18,4)").as("v"))
        // duplicate-timestamp collapse (max v per (symbol, ts)) INSIDE
        // the symbol partitioning: under (ts asc, v desc) the first row
        // of each ts-run is the max — a groupBy(symbol, ts) would
        // shuffle the big side a second time. The stats frame below
        // needs (ts asc), a prefix of this sort, so the pass adds no
        // exchange and no re-sort.
        val wD = Window.partitionBy("symbol")
          .orderBy(col("ts").asc, col("v").desc)
        val obs = raw
          .withColumn("__pts", lag("ts", 1).over(wD))
          .filter(col("__pts").isNull || col("__pts") =!= col("ts"))
          .drop("__pts")
        val fr = Window.partitionBy("symbol").orderBy(col("ts").asc)
          .rowsBetween(-23, Window.currentRow)
        val cntD = count(lit(1)).over(fr).cast("double")
        val sumD = sum(col("v")).over(fr).cast("double")
        val sumSqD = sum(col("v") * col("v")).over(fr).cast("double")
        val mean = sumD / cntD
        val variance = (sumSqD - sumD * sumD / cntD) / (cntD - lit(1.0))
        val std = sqrt(greatest(variance, lit(0.0)))
        obs
          .withColumn("n_win", count(lit(1)).over(fr).cast("long"))
          .withColumn("zscore",
            when(std > 0, (col("v").cast("double") - mean) / std))
          .filter(col("n_win") >= 12 && abs(col("zscore")) > 2.5)
          .select(col("symbol"), col("ts"),
            col("v").cast("double").as("value"), col("zscore"))
          .orderBy("symbol", "ts")
      },
      """WITH obs AS (
        |  SELECT 'SYM' || CAST(user_id % 20 AS VARCHAR) || 'USDTM' AS symbol,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    max(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT symbol, ts, v,
        |    (count(*) OVER fr)::DOUBLE AS cnt,
        |    (sum(v) OVER fr)::DOUBLE AS s,
        |    (sum(v*v) OVER fr)::DOUBLE AS sq,
        |    count(*) OVER fr AS n_win
        |  FROM obs WINDOW fr AS (PARTITION BY symbol ORDER BY ts ASC
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT symbol, ts, v, n_win,
        |    CASE WHEN sqrt(greatest((sq - s*s/cnt) / (cnt - 1.0), 0.0)) > 0
        |         THEN (v::DOUBLE - s/cnt)
        |              / sqrt(greatest((sq - s*s/cnt) / (cnt - 1.0), 0.0))
        |    END AS zscore
        |  FROM w)
        |SELECT symbol, ts, v::DOUBLE AS value, zscore FROM z
        |WHERE n_win >= 12 AND abs(zscore) > 2.5
        |ORDER BY symbol, ts""".stripMargin),

    // g4: per-symbol OLS trend — slope/intercept of value over time, the
    // "is this funding rate drifting" signal. One hash aggregation (all
    // five sums in a single map-side-combined pass), no window, no sort.
    // NOT regr_slope(): its float accumulation order is engine- and
    // partition-dependent. All sums are exact DECIMALs (x is seconds from
    // a fixed anchor, so x² sums stay far from the 38-digit cap), then
    // slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) is evaluated once in
    // doubles — exactly-rounded ops, bit-identical in the oracle replay.
    QueryDef("g4_trend_slope",
      (s, dir) => {
        val anchor = lit("2024-01-01 00:00:00").cast("timestamp")
        val e = Tables.events(s, dir)
          .select(
            concat(lit("SYM"), (col("user_id") % 20).cast("string"),
              lit("USDTM")).as("symbol"),
            (unix_timestamp(col("ts")) - unix_timestamp(anchor))
              .cast("decimal(18,0)").as("x"),
            col("value").cast("decimal(18,4)").as("y"))
        val agg = e.groupBy("symbol").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"))
        agg
          .withColumn("slope",
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")))
          .select(col("symbol"), col("n").cast("long").as("n_obs"),
            col("slope"),
            ((col("sy") - col("slope") * col("sx")) / col("n"))
              .as("intercept"))
          .orderBy("symbol")
      },
      """WITH e AS (
        |  SELECT 'SYM' || CAST(user_id % 20 AS VARCHAR) || 'USDTM' AS symbol,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
        |      - epoch_us(TIMESTAMP '2024-01-01 00:00:00') // 1000000
        |      AS xs,
        |    CAST(value AS DECIMAL(18,4)) AS y
        |  FROM events),
        |d AS (SELECT symbol, CAST(xs AS DECIMAL(18,0)) AS x, y FROM e),
        |a AS (SELECT symbol,
        |    (count(*))::DOUBLE AS n,
        |    (sum(x))::DOUBLE AS sx,
        |    (sum(y))::DOUBLE AS sy,
        |    (sum(x*y))::DOUBLE AS sxy,
        |    (sum(x*x))::DOUBLE AS sxx,
        |    count(*)::BIGINT AS n_obs
        |  FROM d GROUP BY symbol),
        |r AS (SELECT symbol, n_obs, n, sx, sy,
        |    (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope
        |  FROM a)
        |SELECT symbol, n_obs, slope,
        |  (sy - slope*sx) / n AS intercept
        |FROM r ORDER BY symbol""".stripMargin),

    // g5: pairwise Pearson correlation between symbol series on a shared
    // hourly grid — the co-movement matrix a funding monitor screens for
    // correlated rates. Hourly collapse first (symbols × hours frame,
    // corpus-size-invariant like g1's grid), then ops.PairCorr: a
    // budgeted hour-key self-join + one exact-decimal hash aggregation
    // per pair (no corr() builtin — its float accumulation order is
    // engine-specific). The 1000-pair budget admits a 45-symbol universe,
    // comfortably above the fixtures' 20, so nothing is dropped here and
    // the oracle needs no keep-list — g6 below exercises a budget that
    // BITES, oracle-replayed.
    QueryDef("g5_pairwise_corr",
      (s, dir) =>
        PairCorr.pearsonPairs(hourlySeries(s, dir), "symbol", "h", "v",
          maxPairs = 1000L, minOverlap = 24L)
          .orderBy("sym_a", "sym_b"),
      s"""WITH hourly AS ($HourlySql),
         |p AS (SELECT x.symbol AS sym_a, y.symbol AS sym_b,
         |    x.v AS va, y.v AS vb
         |  FROM hourly x JOIN hourly y ON x.h = y.h
         |  WHERE x.symbol < y.symbol),
         |$CorrTailSql""".stripMargin),

    // g6: the same correlation screen under a pair budget that BITES —
    // maxPairs=70 admits 12 of the fixtures' 20 symbols (12·11/2 = 66
    // pairs), kept deterministically (densest series first, name
    // tie-break). The oracle replays the keep-list selection exactly, so
    // the budget SEMANTICS — not just the cap's existence — are
    // hash-verified; PairCorr.droppedSeries reports the other 8.
    QueryDef("g6_pairwise_corr_budget",
      (s, dir) =>
        PairCorr.pearsonPairs(hourlySeries(s, dir), "symbol", "h", "v",
          maxPairs = 70L, minOverlap = 24L)
          .orderBy("sym_a", "sym_b"),
      s"""WITH hourly AS ($HourlySql),
         |keep AS (SELECT symbol FROM hourly GROUP BY symbol
         |  ORDER BY count(*) DESC, symbol ASC LIMIT 12),
         |p AS (SELECT x.symbol AS sym_a, y.symbol AS sym_b,
         |    x.v AS va, y.v AS vb
         |  FROM hourly x JOIN hourly y ON x.h = y.h
         |  WHERE x.symbol < y.symbol
         |    AND x.symbol IN (SELECT symbol FROM keep)
         |    AND y.symbol IN (SELECT symbol FROM keep)),
         |$CorrTailSql""".stripMargin),

    // g7: integer-exact weighted PageRank (Graph.pageRank), 3 damped
    // iterations over the bipartite customer⇄supplier trade graph
    // (edge weight = lineitems shipped, both directions). The Spark
    // side iterates join+aggregate over a persisted edge frame; the
    // oracle unrolls the SAME scaled-integer recurrence as three CTE
    // generations — every rank is a deterministic BIGINT, so the
    // hash compare certifies all three iterations bit-for-bit.
    QueryDef("g7_pagerank",
      (s, dir) => {
        import graft.ops.Graph
        // numeric node ids (customer 2k, supplier 2k+1): the edge-build
        // shuffle moves two longs per edge, not two strings — the op
        // itself is id-type-generic (GraphSpec runs it on strings)
        val e0 = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
          .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(
            (col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .agg(count(lit(1)).as("w"))
        // symmetrize in ONE pass over the aggregate: the union
        // formulation (e0 UNION e0 swapped) planned the join+aggregate
        // subtree twice — exchange reuse deduplicates the shuffle but
        // the final aggregate still ran per side; exploding both
        // directions from one aggregate output emits the identical
        // edge multiset at half the aggregate cost
        val edges = e0.select(explode(array(
            struct(col("src"), col("dst")),
            struct(col("dst").as("src"), col("src").as("dst")))).as("e"),
            col("w"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"), col("w"))
        Graph.pageRank(edges, iterations = 3)
          .orderBy(col("rank").desc, col("node").asc)
      },
      s"""WITH e0 AS (SELECT (o_custkey * 2)::BIGINT AS src,
         |    (l_suppkey * 2 + 1)::BIGINT AS dst, count(*)::BIGINT AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |eb AS (SELECT src, dst, w FROM e0
         |  UNION ALL SELECT dst, src, w FROM e0),
         |ow AS (SELECT src, sum(w)::BIGINT AS tw FROM eb GROUP BY src),
         |n AS (SELECT src AS node FROM eb UNION SELECT dst FROM eb),
         |r0 AS (SELECT node, ${graft.ops.Graph.Scale}::BIGINT AS rank FROM n),
         |${(1 to 3).map(i => s"""c$i AS (SELECT eb.dst AS node,
         |    sum((r.rank // o.tw) * eb.w
         |        + ((r.rank % o.tw) * eb.w) // o.tw)::BIGINT AS c
         |  FROM eb JOIN r${i - 1} r ON r.node = eb.src
         |  JOIN ow o ON o.src = eb.src GROUP BY eb.dst),
         |r$i AS (SELECT n.node,
         |    (${15 * graft.ops.Graph.Scale / 100} + (85 * coalesce(c$i.c, 0)) // 100
         |      )::BIGINT AS rank
         |  FROM n LEFT JOIN c$i USING (node))""").mkString(",\n")}
         |SELECT node, rank FROM r3
         |ORDER BY rank DESC, node ASC""".stripMargin),

    // g8: exponentially weighted moving average of the funding-rate
    // series — the trailing-stats family's decay-weighted member (the
    // reference's funding_stats_etl.py:63-120 computes flat trailing
    // means; an EWMA is what the same monitor uses when recent ticks
    // should dominate). Same one-shuffle shape as g3: dedup inside the
    // symbol partitioning, then a lag-chain over the same sort — two
    // window frames, one exchange, no re-sort.
    //
    // Determinism: λ = 1/2, so every weight 2^-k is an exact double and
    // x * 2^-k is a pure exponent shift (no rounding); the sums run in
    // the same left-associative order in both engines and the divisor
    // Σλ^k = 1.9921875 is exact — the EWMA replays bit-identically in
    // DuckDB, no tolerance needed. Rows are emitted at every 16th tick
    // per symbol (row_number, integer-deterministic), which also
    // guarantees all 8 taps are populated — no partial-window branch.
    QueryDef("g8_ewma",
      (s, dir) => {
        val obs = tickSeries(s, dir)
        val w = Window.partitionBy("symbol").orderBy(col("ts").asc)
        val taps = (0 to 7).map { k =>
          val x = if (k == 0) col("v") else lag(col("v"), k).over(w)
          x * lit(1.0 / (1L << k))
        }
        obs
          .withColumn("rn", row_number().over(w))
          .withColumn("ewma", taps.reduce(_ + _) / lit(1.9921875))
          .filter(col("rn") % 16 === 0)
          .select(col("symbol"), col("ts"), col("v").as("value"),
            col("ewma"))
          .orderBy("symbol", "ts")
      },
      """WITH obs AS (
        |  SELECT 'SYM' || CAST(user_id % 20 AS VARCHAR) || 'USDTM' AS symbol,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    (max(CAST(value AS DECIMAL(18,4))))::DOUBLE AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT symbol, ts, v,
        |    lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
        |    lag(v, 3) OVER w AS l3, lag(v, 4) OVER w AS l4,
        |    lag(v, 5) OVER w AS l5, lag(v, 6) OVER w AS l6,
        |    lag(v, 7) OVER w AS l7,
        |    row_number() OVER w AS rn
        |  FROM obs WINDOW w AS (PARTITION BY symbol ORDER BY ts ASC))
        |SELECT symbol, ts, v AS value,
        |  (v * 1.0 + l1 * 0.5 + l2 * 0.25 + l3 * 0.125 + l4 * 0.0625
        |    + l5 * 0.03125 + l6 * 0.015625 + l7 * 0.0078125)
        |    / 1.9921875 AS ewma
        |FROM l WHERE rn % 16 = 0
        |ORDER BY symbol, ts""".stripMargin),

    // g9: running-peak drawdown per symbol — the monitoring twin of
    // g8's decay average (how far below its high-water mark is this
    // series?). One window pass computes peak (running max) and the
    // emission counter over the SAME (symbol, ts) sort — one exchange.
    // Determinism: running max is exact (no accumulation), and the
    // drawdown is two IEEE ops (subtract, divide) in the same order
    // both engines — bit-identical, no tolerance. Frames are explicit
    // ROWS on both sides so peer-row semantics can never differ.
    QueryDef("g9_drawdown",
      (s, dir) => {
        val obs = tickSeries(s, dir)
        val w = Window.partitionBy("symbol").orderBy(col("ts").asc)
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        obs
          .withColumn("peak", max(col("v")).over(run))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") % 16 === 0)
          .withColumn("drawdown",
            when(col("peak") =!= 0.0, (col("v") - col("peak")) / col("peak")))
          .select(col("symbol"), col("ts"), col("v").as("value"),
            col("peak"), col("drawdown"))
          .orderBy("symbol", "ts")
      },
      """WITH obs AS (
        |  SELECT 'SYM' || CAST(user_id % 20 AS VARCHAR) || 'USDTM' AS symbol,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    (max(CAST(value AS DECIMAL(18,4))))::DOUBLE AS v
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT symbol, ts, v,
        |    max(v) OVER (PARTITION BY symbol ORDER BY ts ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
        |    row_number() OVER (PARTITION BY symbol ORDER BY ts ASC) AS rn
        |  FROM obs)
        |SELECT symbol, ts, v AS value, peak,
        |  CASE WHEN peak <> 0 THEN (v - peak) / peak END AS drawdown
        |FROM w WHERE rn % 16 = 0
        |ORDER BY symbol, ts""".stripMargin),

    // g10: OHLC candle resample — the exchange-data aggregation the
    // reference's funding monitor sits next to: per (symbol, hour),
    // open = value at the earliest tick, high/low = extrema, close =
    // value at the latest tick, plus the tick count. ONE shuffle on
    // (symbol, hour) does everything — open/close via min_by/max_by on
    // the tick timestamp (deterministic: per-ts dedup makes ts unique
    // inside a candle), extrema are exact double comparisons, and no
    // value is ever summed — bit-identical oracle replay, no tolerance.
    QueryDef("g10_ohlc",
      (s, dir) => {
        tickSeries(s, dir)
          .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
          .agg(
            min_by(col("v"), col("ts")).as("open"),
            max(col("v")).as("high"),
            min(col("v")).as("low"),
            max_by(col("v"), col("ts")).as("close"),
            count(lit(1)).cast("long").as("n_ticks"))
          .orderBy("symbol", "h")
      },
      """WITH obs AS (
        |  SELECT 'SYM' || CAST(user_id % 20 AS VARCHAR) || 'USDTM' AS symbol,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    (max(CAST(value AS DECIMAL(18,4))))::DOUBLE AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT symbol, date_trunc('hour', ts) AS h,
        |  arg_min(v, ts) AS open, max(v) AS high, min(v) AS low,
        |  arg_max(v, ts) AS close, count(*)::BIGINT AS n_ticks
        |FROM obs GROUP BY symbol, date_trunc('hour', ts)
        |ORDER BY symbol, h""".stripMargin))

  /** Shared input frame for the per-tick monitors (g8/g9/g10), the
    * tick-level sibling of [[hourlySeries]]: per-symbol series with
    * duplicate timestamps collapsed to the max value — under
    * (ts asc, vd desc) the first row of each ts-run is the max,
    * discovered INSIDE the same symbol partitioning the downstream
    * windows reuse (no extra exchange). Decimal-exact until the final
    * double cast, so the collapse replays bit-identically in the
    * oracle's `GROUP BY ts, max(v)`. */
  private def tickSeries(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val raw = Tables.events(s, dir)
      .select(
        concat(lit("SYM"), (col("user_id") % 20).cast("string"),
          lit("USDTM")).as("symbol"),
        col("ts"), col("value").cast("decimal(18,4)").as("vd"))
    val wD = Window.partitionBy("symbol")
      .orderBy(col("ts").asc, col("vd").desc)
    raw
      .withColumn("__pts", lag("ts", 1).over(wD))
      .filter(col("__pts").isNull || col("__pts") =!= col("ts"))
      .drop("__pts")
      .withColumn("v", col("vd").cast("double"))
  }

  /** Shared input frame for the correlation pair (g5/g6): the per-symbol
    * hourly series, duplicate timestamps collapsed by max — exact
    * decimals so the downstream sums replay bit-identically. */
  private def hourlySeries(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    Tables.events(s, dir)
      .select(
        concat(lit("SYM"), (col("user_id") % 20).cast("string"),
          lit("USDTM")).as("symbol"),
        date_trunc("hour", col("ts")).as("h"),
        col("value").cast("decimal(18,4)").as("v"))
      .groupBy("symbol", "h").agg(max("v").as("v"))

  // defs, not vals: interpolated while `all` (declared above) initializes
  private def HourlySql =
    """SELECT 'SYM' || CAST(user_id % 20 AS VARCHAR) || 'USDTM' AS symbol,
      |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
      |    max(CAST(value AS DECIMAL(18,4))) AS v
      |  FROM events GROUP BY 1, 2""".stripMargin

  /** The exact-sums Pearson tail shared by g5/g6's oracles — mirrors
    * PairCorr.pearsonPairs' arithmetic term for term. */
  private def CorrTailSql =
    """s AS (SELECT sym_a, sym_b,
      |    (count(*))::DOUBLE AS n,
      |    (sum(va))::DOUBLE AS sx, (sum(vb))::DOUBLE AS sy,
      |    (sum(va*vb))::DOUBLE AS sxy,
      |    (sum(va*va))::DOUBLE AS sxx, (sum(vb*vb))::DOUBLE AS syy
      |  FROM p GROUP BY sym_a, sym_b)
      |SELECT sym_a, sym_b, n::BIGINT AS n_hours,
      |  CASE WHEN sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy) > 0
      |       THEN (n*sxy - sx*sy)
      |            / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
      |  END AS corr
      |FROM s WHERE n >= 24.0
      |ORDER BY sym_a, sym_b""".stripMargin
}
