package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Sessionize, TopK, Upsert}

/** Aggregation / dedup / sort / set-operation operators (SURVEY.md §2.4,
  * §2.6, §2.7: A1-A8, O1-O3, U1 + the free extras: cube, rollup, exact and
  * approximate percentiles, approx distinct).
  *
  * Float discipline for oracle parity: double sums are computed as exact
  * DECIMAL sums cast back to double (decimal addition is associative;
  * double addition is not, so plain sum(double) differs bitwise between
  * engines and between partitionings). min/max/count are exact already.
  */
object AggQueries {

  val all: Seq[QueryDef] = Seq(

    // A1: hash group-by MIN (lowest lending rate per term,
    // lending_data_etl.py:43-45) — partial+final HashAggregate, map-side
    // combine makes this shuffle O(groups), not O(rows).
    QueryDef("a1_groupby_min",
      (s, dir) => Tables.events(s, dir)
        .groupBy((col("user_id") % 4).as("term"))
        .agg(min("value").as("min_rate"))
        .orderBy("term"),
      """SELECT user_id % 4 AS term, min(value) AS min_rate
        |FROM events GROUP BY 1 ORDER BY term""".stripMargin),

    // A2: DISTINCT projection (distinct active symbols,
    // funding_rates_etl.py:21).
    QueryDef("a2_distinct",
      (s, dir) => Tables.customer(s, dir)
        .select("c_mktsegment").distinct()
        .orderBy("c_mktsegment"),
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"),

    // A3: dedup on key subset with deterministic keep-FIRST (pandas
    // drop_duplicates semantics, funding_rates_etl.py:95 — Spark's
    // dropDuplicates keeps an arbitrary row; the row_number tie-break
    // pins it).
    QueryDef("a3_dedup_keepfirst",
      (s, dir) => Dedup.keepFirst(
        Tables.events(s, dir),
        keys = Seq("user_id", "event_type"),
        order = Seq(col("ts").asc, col("event_id").asc))
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type"),
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),

    // A6: latest-value-per-group (newest funding rate per symbol,
    // funding_stats_etl.py:77-80).
    QueryDef("a6_latest_per_key",
      (s, dir) => Dedup.keepFirst(
        Tables.events(s, dir),
        keys = Seq("user_id"),
        order = Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "ts", "value")
        .orderBy("user_id"),
      """SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
        |  SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin),

    // TPC-H Q1-shaped pricing summary: the canonical multi-aggregate
    // group-by, all sums via the exact-decimal discipline.
    QueryDef("a4_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Rolling 7-day active users (the WAU shape): rolling DISTINCT
    // counts don't compose through window frames, so the scalable
    // formulation pre-collapses to the (day, user) frame (tiny vs the
    // event stream), fans each day out to the ≤7 window-ends it serves,
    // and counts distinct per window-end — explode factor is the window
    // length, candidate volume days×users, never events×7.
    QueryDef("a22_rolling_active_users",
      (s, dir) => {
        val du = Tables.events(s, dir)
          .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
          .distinct()
        val maxDay = du.agg(max("d").as("max_d"))
        du.withColumn("wend", explode(expr(
            "sequence(d, d + INTERVAL 6 DAYS, INTERVAL 1 DAY)")))
          .crossJoin(broadcast(maxDay))
          .filter(col("wend") <= col("max_d"))
          .groupBy("wend")
          .agg(countDistinct("user_id").as("active_7d"))
          .orderBy("wend")
      },
      """WITH du AS (SELECT DISTINCT
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, user_id
        |  FROM events),
        |mx AS (SELECT max(d) AS max_d FROM du),
        |c AS (SELECT unnest(generate_series(d, d + INTERVAL 6 DAY,
        |    INTERVAL 1 DAY)) AS wend, user_id FROM du)
        |SELECT wend, count(DISTINCT user_id)::BIGINT AS active_7d
        |FROM c, mx WHERE wend <= max_d
        |GROUP BY wend ORDER BY wend""".stripMargin),

    // Data profiling (deequ-style observability): per-column row/null/
    // distinct counts plus typed min/max — the first thing a pipeline
    // runs on an unfamiliar or drifting table. The work lives in
    // ops.Profile as a schema-driven library op over ANY DataFrame (one
    // single-pass aggregate for all columns, pivoted to report rows);
    // this query is a thin wrapper profiling four events columns so the
    // oracle can replay it. ProfileSpec profiles documents/lineitem with
    // zero per-table code.
    QueryDef("c4_data_profile",
      (s, dir) => graft.ops.Profile.profile(
        Tables.events(s, dir)
          .select("event_id", "user_id", "value", "event_type")),
      """WITH p AS (
        |  SELECT 'event_id' AS col_name, count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |    count(DISTINCT event_id)::BIGINT AS n_distinct,
        |    (min(event_id))::DOUBLE AS min_num,
        |    (max(event_id))::DOUBLE AS max_num,
        |    NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
        |  FROM events
        |  UNION ALL
        |  SELECT 'user_id', count(*)::BIGINT,
        |    sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT user_id)::BIGINT,
        |    (min(user_id))::DOUBLE, (max(user_id))::DOUBLE,
        |    NULL::VARCHAR, NULL::VARCHAR
        |  FROM events
        |  UNION ALL
        |  SELECT 'value', count(*)::BIGINT,
        |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT value)::BIGINT,
        |    min(value), max(value),
        |    NULL::VARCHAR, NULL::VARCHAR
        |  FROM events
        |  UNION ALL
        |  SELECT 'event_type', count(*)::BIGINT,
        |    sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT event_type)::BIGINT,
        |    NULL::DOUBLE, NULL::DOUBLE,
        |    min(event_type), max(event_type)
        |  FROM events)
        |SELECT * FROM p ORDER BY col_name""".stripMargin),

    // Free extra: the classic 3-table OLAP pipeline in ONE query (TPC-H
    // Q3 shape): selective dim filter → fact join chain on one key path
    // (custkey, then orderkey) → revenue aggregation → global top-10.
    // Plan shape at scale: the filtered customer side broadcasts, the
    // orders⋈lineitem equi-join shuffles on orderkey once, both date
    // filters reach the parquet scans, and the final top-10 is
    // TakeOrderedAndProject (no global sort). Revenue uses the a4
    // decimal-sum discipline; the deterministic tiebreak is l_orderkey.
    QueryDef("a20_shipping_priority",
      (s, dir) => {
        val cut = lit("1998-06-01 00:00:00").cast("timestamp")
        val c = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_custkey", "o_orderdate",
            "o_orderpriority")
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin),

    // Free extra: the 6-table snowflake rollup (TPC-H Q5 shape) —
    // revenue by nation where customer and supplier share the nation,
    // region-filtered. Exercises the whole relational catalog in one
    // plan: region→nation→supplier is a broadcast dim CHAIN (each hop
    // dimension-sized), the customer⋈orders⋈lineitem fact path shuffles
    // on its join keys, and the nation equality (c_nationkey =
    // s_nationkey) rides the fact row, costing nothing extra. Same a4
    // decimal-sum discipline for revenue.
    QueryDef("a21_local_supplier_volume",
      (s, dir) => {
        val cut = lit("1997-01-01 00:00:00").cast("timestamp")
        val nat = Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val sup = Tables.supplier(s, dir)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_nationkey", "n_name")
        val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= cut)
          .select("o_orderkey", "o_custkey")
        val l = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_suppkey", "l_extendedprice",
            "l_discount")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND c_nationkey = s_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin),

    // Free extra: CUBE over two grouping columns (reference has none;
    // Spark/DuckDB both native). NULLS FIRST pinned — Spark's ASC default
    // is nulls-first, DuckDB's is nulls-last.
    QueryDef("a8_cube",
      (s, dir) => Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // Free extra: ROLLUP.
    QueryDef("a9_rollup",
      (s, dir) => Tables.orders(s, dir)
        .rollup("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderpriority)
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin),

    // Free extra: exact median per group (Spark `percentile` vs DuckDB
    // `quantile_cont`, both linear-interpolated).
    QueryDef("a10_percentile",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5D)").as("median_value"))
        .orderBy("event_type"),
      """SELECT event_type, quantile_cont(value, 0.5) AS median_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Winsorization — clip each value to its group's [p01, p99], the
    // standard outlier-capping cleanse before training on numeric
    // features. The percentile frame is groups-sized → broadcast back
    // onto the fact side (no shuffle of the big side). least/greatest
    // return one of their inputs, so no float-arithmetic parity risk.
    // Exact percentile is the oracle-checkable form; at 100 TB swap in
    // approx_percentile for the cutoffs (same plan shape) — exact
    // per-group percentile materializes the group's value multiset.
    QueryDef("c3_winsorize",
      (s, dir) => {
        val pct = Tables.events(s, dir).groupBy("event_type")
          .agg(expr("percentile(value, 0.01D)").as("p01"),
            expr("percentile(value, 0.99D)").as("p99"))
        Tables.events(s, dir)
          .join(broadcast(pct), "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            least(greatest(col("value"), col("p01")), col("p99"))
              .as("value_w"),
            (col("value") < col("p01") || col("value") > col("p99"))
              .as("clipped"))
          .orderBy("event_id")
      },
      """WITH p AS (SELECT event_type,
        |    quantile_cont(value, 0.01) AS p01,
        |    quantile_cont(value, 0.99) AS p99
        |  FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value,
        |  least(greatest(value, p01), p99) AS value_w,
        |  (value < p01 OR value > p99) AS clipped
        |FROM events JOIN p USING (event_type)
        |ORDER BY event_id""".stripMargin),

    // Free extra: HLL++ approximate distinct. Raw sketch estimates are
    // algorithm-specific (not engine-portable), so the oracle-checked
    // output is the exact distinct count plus an error-bound verdict:
    // each engine runs its OWN approx_count_distinct and asserts it lands
    // within 10% of exact (Spark's default rsd is 5%, DuckDB's HLL is
    // tighter — both sides must report true for the hashes to match).
    QueryDef("a11_approx_distinct",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id")).as("__approx"))
        .select(col("event_type"), col("n_users"),
          (abs(col("__approx") - col("n_users")) <=
            col("n_users").cast("double") * 0.1).as("approx_ok"))
        .orderBy("event_type"),
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    <= count(DISTINCT user_id)::DOUBLE * 0.1 AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // O1: multi-key sort (ORDER BY symbol ASC, funding_time DESC,
    // funding_stats_etl.py:28-30).
    QueryDef("o1_multisort",
      (s, dir) => Tables.events(s, dir)
        .select("user_id", "event_id", "ts", "value")
        .orderBy(col("user_id").asc, col("ts").desc, col("event_id").asc),
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |FROM events ORDER BY user_id ASC, ts DESC, event_id ASC""".stripMargin),

    // O2: global top-k — TakeOrderedAndProject (per-partition top-k +
    // k-way merge; never a full sort).
    QueryDef("o2_global_topk",
      (s, dir) => TopK.global(Tables.events(s, dir)
        .select("event_id", "user_id", "value"),
        Seq(col("value").desc, col("event_id").asc), 10),
      """SELECT event_id, user_id, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 10""".stripMargin),

    // O2b: top-k per group (ranked window, one shuffle).
    QueryDef("o2_topk_per_group",
      (s, dir) => TopK.perGroup(
        Tables.events(s, dir).select("event_type", "event_id", "value"),
        groupCols = Seq("event_type"),
        order = Seq(col("value").desc, col("event_id").asc), k = 3)
        .orderBy("event_type", "rank"),
      """SELECT event_type, event_id, value, rank FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id ASC) AS rank
        |  FROM events)
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin),

    // O2c: skew-safe salted per-group top-k — same result as
    // o2_topk_per_group by construction (any true top-k row is in its
    // salt bucket's local top-k), verified against the same oracle shape.
    QueryDef("o2_topk_per_group_salted",
      (s, dir) => TopK.perGroupSalted(
        Tables.events(s, dir).select("event_type", "event_id", "value"),
        groupCols = Seq("event_type"),
        order = Seq(col("value").desc, col("event_id").asc), k = 3,
        salt = col("event_id"), buckets = 8)
        .orderBy("event_type", "rank"),
      """SELECT event_type, event_id, value, rank FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id ASC) AS rank
        |  FROM events)
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin),

    // A4b: wall-clock trailing mean — RANGE frame over epoch seconds
    // (the time-based generalization of the row-counted horizons,
    // SURVEY §2.5): mean of each user's events in the 7 days up to their
    // newest event. Range frames are tie-inclusive in both engines.
    QueryDef("a15_trailing_by_time",
      (s, dir) => graft.ops.Stats.trailingByTime(
        Tables.events(s, dir).select("user_id", "ts", "value"),
        key = "user_id", time = "ts",
        value = col("value").cast("decimal(18,2)"),
        windows = Seq(("mean_7d", 604800L)))
        .select("user_id", "mean_7d")
        .orderBy("user_id"),
      """WITH e AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS tsec,
        |    CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |w AS (SELECT user_id,
        |    (sum(v) OVER fr)::DOUBLE / count(*) OVER fr AS mean_7d,
        |    row_number() OVER (PARTITION BY user_id ORDER BY tsec DESC) AS rn
        |  FROM e WINDOW fr AS (PARTITION BY user_id ORDER BY tsec
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW))
        |SELECT user_id, mean_7d FROM w WHERE rn = 1
        |ORDER BY user_id""".stripMargin),

    // A12: sessionization (gaps-and-islands) — 30-min-gap sessions per
    // user, one shuffle end-to-end (lag, cumulative numbering and the
    // session aggregate all share partitionBy(user_id)).
    QueryDef("a12_sessionize",
      (s, dir) => Sessionize.sessions(
        Tables.events(s, dir).select("user_id", "ts", "value", "event_id"),
        key = "user_id", time = "ts", gapSeconds = 1800,
        tieBreak = Seq(col("event_id").asc),
        aggs = Seq((sum(col("value").cast("decimal(18,2)")).cast("double"),
          "total_value")))
        .orderBy("user_id", "session_seq"),
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events),
        |m AS (SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000 > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |s AS (SELECT user_id, ts, value,
        |    (sum(is_new) OVER (PARTITION BY user_id
        |                       ORDER BY ts ASC, event_id ASC
        |                       ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  (sum(CAST(value AS DECIMAL(18,2))))::DOUBLE AS total_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin),

    // A13: pivot (long→wide crosstab) with an EXPLICIT value list — the
    // implicit form adds a blocking distinct pass over the pivot column
    // and makes the output schema data-dependent, both wrong at scale.
    QueryDef("a13_pivot",
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
        .orderBy("user_id"),
      """SELECT user_id,
        |  (sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END))::DOUBLE AS click,
        |  (sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END))::DOUBLE AS error,
        |  (sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END))::DOUBLE AS purchase,
        |  (sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END))::DOUBLE AS signup,
        |  (sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END))::DOUBLE AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // A14: unpivot/melt (wide→long) — the pivot inverse; a narrow
    // Expand (no shuffle), each input row emits one row per measure.
    QueryDef("a14_unpivot",
      (s, dir) => Tables.part(s, dir)
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"),
            col("p_retailprice")),
          "measure", "val")
        .orderBy("p_partkey", "measure"),
      """SELECT p_partkey, 'p_size' AS measure, p_size::DOUBLE AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, measure""".stripMargin),

    // A16: explicit GROUPING SETS (between a8 cube and a9 rollup: only
    // the named aggregation levels are expanded).
    QueryDef("a16_grouping_sets",
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_v")
        s.sql("""
          |SELECT event_type, user_id % 4 AS cohort,
          |       count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM events_v
          |GROUP BY GROUPING SETS ((event_type), (user_id % 4), ())
          |ORDER BY event_type NULLS FIRST, cohort NULLS FIRST
          |""".stripMargin)
      },
      """SELECT event_type, user_id % 4 AS cohort, count(*) AS n,
        |  (sum(CAST(value AS DECIMAL(18,2))))::DOUBLE AS total
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 4), ())
        |ORDER BY event_type NULLS FIRST, cohort NULLS FIRST""".stripMargin),

    // O4: keyset-free pagination (LIMIT + OFFSET). OFFSET still scans
    // and discards the skipped rows — fine for page 2, wrong for page
    // 10000; the scalable alternative is the keyset predicate (p7-style
    // range on the last-seen sort key).
    QueryDef("o4_limit_offset",
      (s, dir) => Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100).limit(25),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 25 OFFSET 100""".stripMargin),

    // O5: keyset pagination — the scale-correct page fetch o4's scaladoc
    // caveat points at, as a thin wrapper over ops.Keyset (the generic
    // lexicographic-cursor op; KeysetSpec proves the multi-page
    // pages-⊎-pages ≡ one-scan invariant incl. a duplicate-date run
    // straddling a boundary). The cursor tuple is (o_orderdate,
    // o_orderkey); Keyset spells the row-value comparison as the same
    // explicit OR the oracle uses, so both engines plan it identically.
    QueryDef("o5_keyset_pagination",
      (s, dir) => graft.ops.Keyset.page(
        Tables.orders(s, dir)
          .select("o_orderkey", "o_orderdate", "o_totalprice"),
        Seq("o_orderdate", "o_orderkey"),
        Some(Seq(lit("1997-06-01 00:00:00").cast("timestamp"),
          lit(500L))),
        25),
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
        |   OR (o_orderdate = TIMESTAMP '1997-06-01 00:00:00'
        |       AND o_orderkey > 500)
        |ORDER BY o_orderdate, o_orderkey LIMIT 25""".stripMargin),

    // A17: scalar-subquery comparison (value above the GLOBAL mean) —
    // DataFrame form: 1-row aggregate broadcast-crossed into the filter;
    // never a driver-side collect of the scalar.
    QueryDef("a17_scalar_subquery",
      (s, dir) => {
        val events = Tables.events(s, dir)
        val mean = events.agg(
          (sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("__mean"))
        events.crossJoin(broadcast(mean))
          .filter(col("value") > col("__mean"))
          .select("event_id", "user_id", "value")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id, value FROM events
        |WHERE value > (SELECT (sum(CAST(value AS DECIMAL(18,2))))::DOUBLE
        |                      / count(*) FROM events)
        |ORDER BY event_id""".stripMargin),

    // A18: correlated subquery, decorrelated — events above THEIR USER's
    // mean. The correlated `WHERE value > (SELECT avg .. WHERE same
    // user)` re-executes per row; the window rewrite computes every
    // per-user mean in one pass + one shuffle.
    QueryDef("a18_above_user_mean",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        Tables.events(s, dir)
          .withColumn("__user_mean",
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
              count(lit(1)).over(w))
          .filter(col("value") > col("__user_mean"))
          .select("event_id", "user_id", "value")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value,
        |    (sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id))::DOUBLE
        |      / count(*) OVER (PARTITION BY user_id) AS user_mean
        |  FROM events)
        |WHERE value > user_mean ORDER BY event_id""".stripMargin),

    // Funnel analysis: how far each user progresses through the ordered
    // view → click → purchase sequence, each step strictly AFTER the
    // previous step's first completion and within a 24-hour conversion
    // window of it. Three staged min-after aggregations, all shuffling
    // on the same user_id key (the exchanges reuse the partitioning);
    // the final histogram is stage → users.
    QueryDef("a19_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select("user_id", "event_type", "ts")
        val s1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        Tables.events(s, dir).select("user_id").distinct()
          .join(s1.select("user_id").withColumn("__s1", lit(1)),
            Seq("user_id"), "left")
          .join(s2.select("user_id").withColumn("__s2", lit(1)),
            Seq("user_id"), "left")
          .join(s3.select("user_id").withColumn("__s3", lit(1)),
            Seq("user_id"), "left")
          .select(when(col("__s3").isNotNull, 3)
            .when(col("__s2").isNotNull, 2)
            .when(col("__s1").isNotNull, 1)
            .otherwise(0).cast("long").as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      """WITH e AS (SELECT user_id, event_type, ts FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL 24 HOUR GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
        |            WHEN s2.user_id IS NOT NULL THEN 2
        |            WHEN s1.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage,
        |  count(*) AS n_users
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |GROUP BY 1 ORDER BY stage""".stripMargin),

    // U1: UNION ALL (accumulate per-symbol frames,
    // funding_stats_etl.py:99).
    QueryDef("u1_union_all",
      (s, dir) => {
        val e = Tables.events(s, dir).select("event_id", "event_type", "value")
        e.filter(col("event_type") === "purchase")
          .union(e.filter(col("event_type") === "error"))
          .orderBy("event_id")
      },
      """SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin),

    // Free extra: INTERSECT (set semantics in both engines).
    // Multiset variants: bag semantics keep duplicate multiplicity
    // (min/difference of per-row counts) — Spark intersectAll/exceptAll.
    QueryDef("u4_intersect_all",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.filter(col("event_type") === "purchase").select("user_id")
          .intersectAll(e.filter(col("event_type") === "view")
            .select("user_id"))
          .orderBy("user_id")
      },
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'view'
        |ORDER BY user_id""".stripMargin),

    QueryDef("u5_except_all",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.filter(col("event_type") === "purchase").select("user_id")
          .exceptAll(e.filter(col("event_type") === "view")
            .select("user_id"))
          .orderBy("user_id")
      },
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT ALL
        |SELECT user_id FROM events WHERE event_type = 'view'
        |ORDER BY user_id""".stripMargin),

    QueryDef("u2_intersect",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.filter(col("event_type") === "purchase").select("user_id")
          .intersect(e.filter(col("event_type") === "error").select("user_id"))
          .orderBy("user_id")
      },
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin),

    // Free extra: EXCEPT.
    QueryDef("u3_except",
      (s, dir) => {
        // value threshold keeps both sides sparse so the difference set is
        // non-empty (every user has every event type in the fixtures —
        // unfiltered EXCEPT would be vacuously empty).
        val e = Tables.events(s, dir).filter(col("value") > 190)
        e.filter(col("event_type") === "view").select("user_id")
          .except(e.filter(col("event_type") === "purchase").select("user_id"))
          .orderBy("user_id")
      },
      """SELECT user_id FROM events WHERE event_type = 'view' AND value > 190
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 190
        |ORDER BY user_id""".stripMargin),

    // S7: merge-upsert — newest row per key wins across an existing table
    // and an update batch (INSERT ... ON CONFLICT DO UPDATE,
    // funding_rates_etl.py:100-111). Split the fixture at mid-month to
    // simulate the two sides; result ≡ latest event per key overall.
    QueryDef("s7_upsert",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select("user_id", "event_type", "ts", "event_id", "value")
        val split = lit("2024-01-16 00:00:00").cast("timestamp")
        def latestPerKey(df: org.apache.spark.sql.DataFrame) =
          Dedup.keepFirst(df, Seq("user_id", "event_type"),
            Seq(col("ts").desc, col("event_id").desc))
        val existing = latestPerKey(e.filter(col("ts") < split))
        val updates = latestPerKey(e.filter(col("ts") >= split))
        Upsert.merge(existing, updates, Seq("user_id", "event_type"), "ts")
          .select("user_id", "event_type", "ts", "event_id", "value")
          .orderBy("user_id", "event_type")
      },
      """SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |FROM (
        |  SELECT user_id, event_type, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),

    // A23: incrementally-maintained rollup (ops/IncrementalAgg) — the
    // append-only form of the reference's full-rescan rebuild
    // (funding_stats_etl.py:63-120). Three disjoint batches are
    // partial-aggregated INDEPENDENTLY and merged pairwise; the oracle
    // recomputes in one scan — hash equality proves the merge algebra
    // (state ⊕ partial(batch) ≡ partial(all)) that lets a 100 TB table
    // pay per-batch cost instead of per-history cost. Decimal state, so
    // merge order can't perturb a bit.
    QueryDef("a23_incremental_rollup",
      (s, dir) => {
        import graft.ops.IncrementalAgg
        val ev = Tables.events(s, dir)
        val batches = (0 to 2).map(i =>
          ev.filter(pmod(col("event_id"), lit(3)) === i))
        val state = batches
          .map(b => IncrementalAgg.partial(b, Seq("event_type"), "value"))
          .reduce(IncrementalAgg.merge(_, _))
        IncrementalAgg.finalize(state).orderBy("event_type")
      },
      """SELECT event_type, count(*)::BIGINT AS n,
        |  (sum(CAST(value AS DECIMAL(18,4))))::DOUBLE AS sum_value,
        |  (sum(CAST(value AS DECIMAL(18,4)))::DOUBLE) / (count(*)::DOUBLE)
        |    AS avg_value,
        |  (min(CAST(value AS DECIMAL(18,4))))::DOUBLE AS min_value,
        |  (max(CAST(value AS DECIMAL(18,4))))::DOUBLE AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // A24: incremental APPROX-DISTINCT state — the one aggregate the
    // (count, sum, min, max) tuple can't carry (exact distinct doesn't
    // merge without the value set). HLL sketches merge register-wise
    // (associative, commutative, replay-idempotent), so per-batch
    // sketch state advances like the sums do. The verdict-oracle
    // pattern of a11: exact distinct must hash-match, and the oracle's
    // literal `true` forces Spark's sketch estimate within 5% of exact
    // (DataSketches HLL_4 @ lgK 12 ≈ 1.6% rsd) — a false anywhere
    // fails the hash compare.
    QueryDef("a24_incremental_distinct",
      (s, dir) => {
        import graft.ops.IncrementalAgg
        val ev = Tables.events(s, dir)
        val batches = (0 to 2).map(i =>
          ev.filter(pmod(col("event_id"), lit(3)) === i))
        val state = batches
          .map(b => IncrementalAgg.partial(b, Seq("event_type"), "value",
            distinctCol = Some("user_id")))
          .reduce(IncrementalAgg.merge(_, _))
        IncrementalAgg.finalize(state)
          .join(ev.groupBy("event_type")
            .agg(countDistinct(col("user_id")).as("n_users")),
            Seq("event_type"))
          .select(col("event_type"), col("n"), col("n_users"),
            (abs(col("approx_distinct") - col("n_users")) <=
              col("n_users").cast("double") * 0.05).as("approx_ok"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(*)::BIGINT AS n,
        |  count(DISTINCT user_id)::BIGINT AS n_users, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // A25: the full never-rescan-history pipeline as one oracle-checked
    // unit — a snapshot table ingests three appends; a consumer walks
    // the version log with changesSince (paying only each version's
    // appended files) and advances a DURABLE rollup state exactly-once
    // per version (advanceVersioned records the (writer, version)
    // high-water mark — the second advance of a replayed version is a
    // no-op, exercised inline). The final state must hash-match the
    // oracle's single scan: CDC feed ⊕ mergeable state ≡ full rescan.
    QueryDef("a25_cdc_rollup",
      (s, dir) => {
        import graft.ops.{IncrementalAgg, Snapshots}
        val base = s"/tmp/graft_stage/${new java.io.File(dir).getName}"
        val facts = s"$base/a25_facts"; val state = s"$base/a25_state"
        Seq(facts, state).foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
        val orders = Tables.orders(s, dir)
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
        (0 to 2).foreach(i => Snapshots.append(
          orders.filter(pmod(col("o_orderkey"), lit(3)) === i), facts))
        (1 to 3).foreach { v =>
          val delta = Snapshots.changesSince(s, facts, v - 1, v)
          IncrementalAgg.advanceVersioned(state, delta,
            Seq("o_orderpriority"), "o_totalprice", "a25", v.toLong)
          // a replayed version must be recognized and skipped
          assert(IncrementalAgg.advanceVersioned(state, delta,
            Seq("o_orderpriority"), "o_totalprice", "a25", v.toLong).isEmpty)
        }
        IncrementalAgg.finalize(Snapshots.read(s, state))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*)::BIGINT AS n,
        |  (sum(CAST(o_totalprice AS DECIMAL(18,4))))::DOUBLE AS sum_value,
        |  (sum(CAST(o_totalprice AS DECIMAL(18,4)))::DOUBLE) /
        |    (count(*)::DOUBLE) AS avg_value,
        |  (min(CAST(o_totalprice AS DECIMAL(18,4))))::DOUBLE AS min_value,
        |  (max(CAST(o_totalprice AS DECIMAL(18,4))))::DOUBLE AS max_value
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // A26: SKETCHES as durable incremental state — the a25 CDC loop,
    // now also carrying per-group TOP ITEMS (Misra-Gries summaries)
    // and QUANTILES (KLL byte sketches) through the versioned state:
    // each version advance merges k-bounded summaries, so a 100 TB
    // rollup keeps heavy hitters and percentiles current without the
    // full pass those aggregates classically force. Replays are
    // exercised inline (second advance of each version must be a
    // no-op). Verification is the t17/t19/t18 verdict-row pattern:
    // exact per-group counts prove the MG bound (est ≤ true,
    // true − est ≤ n/(k+1), nothing above n/(k+1) missing) and exact
    // in-frame ranks prove the KLL ±2.5% rank bound; the oracle
    // recomputes the exact totals and pins every verdict true — which
    // items/values ride inside the sketches is merge-order-dependent
    // (standard MG/KLL indeterminacy), so the verdict row, not the
    // sketch content, is the stable surface.
    QueryDef("a26_sketch_rollup",
      (s, dir) => {
        import graft.ops.{IncrementalAgg, QuantileSketch, Snapshots}
        val hhK = 64
        val base = s"/tmp/graft_stage/${new java.io.File(dir).getName}"
        val facts = s"$base/a26_facts"; val state = s"$base/a26_state"
        Seq(facts, state).foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
        val ev = Tables.events(s, dir)
          .select("event_id", "event_type", "user_id", "value")
        (0 to 2).foreach(i => Snapshots.append(
          ev.filter(pmod(col("event_id"), lit(3)) === i), facts))
        (1 to 3).foreach { v =>
          val delta = Snapshots.changesSince(s, facts, v - 1, v)
          def advance() = IncrementalAgg.advanceVersioned(state, delta,
            Seq("event_type"), "value", "a26", v.toLong,
            heavyHitterCol = Some("user_id"), heavyHitterK = hhK,
            quantileK = 200)
          advance()
          assert(advance().isEmpty) // replayed version recognized
        }
        val st = IncrementalAgg.finalize(Snapshots.read(s, state))
        // MG verdicts against exact per-(group, item) counts
        val est = st.select(col("event_type"),
          explode(col("top_items")).as(Seq("item", "est_count")))
        val exact = ev.groupBy(col("event_type"),
            col("user_id").cast("string").as("item"))
          .agg(count(lit(1)).as("true_n"))
        val totals = ev.groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_rows"))
        val verdict = est
          .join(exact, Seq("event_type", "item"))
          .join(broadcast(totals), "event_type")
          .groupBy("event_type")
          .agg(
            (count(lit(1)) <= hhK).as("within_capacity"),
            (max(col("true_n") - col("est_count")) <=
              max(col("n_rows")).cast("double") / (hhK + 1) &&
              min(col("true_n") - col("est_count")) >= 0).as("bounds_ok"))
        val missed = exact.join(broadcast(totals), "event_type")
          .filter(col("true_n") > col("n_rows").cast("double") / (hhK + 1))
          .join(est, Seq("event_type", "item"), "left_anti")
          .groupBy("event_type").agg(count(lit(1)).as("n_missed"))
        // KLL verdicts: decode the KB-sized state driver-side, verify
        // each estimate's exact rank in-frame (t18 pattern, per group)
        val qRows = st.select("event_type", "kll_sketch").collect()
          .map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val qs = QuantileSketch.quantilesOf(bytes, Seq(0.5, 0.9))
            (r.getString(0), qs(0), qs(1), QuantileSketch.countOf(bytes))
          }.toSeq.sortBy(_._1)
        val qDf = { import s.implicits._
          qRows.toDF("event_type", "p50_est", "p90_est", "n_sk") }
        def rankOk(est: org.apache.spark.sql.Column, p: Double) =
          abs(sum(when(col("value") <= est, 1L).otherwise(0L))
            .cast("double") / max(col("n_sk")).cast("double") - p) <= 0.025
        val rank = ev.join(broadcast(qDf), "event_type")
          .groupBy("event_type")
          .agg(rankOk(col("p50_est"), 0.5).as("p50_ok"),
            rankOk(col("p90_est"), 0.9).as("p90_ok"),
            (max(col("n_sk")) === count(lit(1))).as("count_ok"))
        totals.join(verdict, "event_type")
          .join(missed, Seq("event_type"), "left")
          .join(rank, "event_type")
          .select(col("event_type"), col("n_rows"), col("within_capacity"),
            col("bounds_ok"),
            coalesce(col("n_missed"), lit(0L)).as("n_missed_heavy"),
            col("p50_ok"), col("p90_ok"), col("count_ok"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(*)::BIGINT AS n_rows,
        |  true AS within_capacity, true AS bounds_ok,
        |  0::BIGINT AS n_missed_heavy,
        |  true AS p50_ok, true AS p90_ok, true AS count_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // C5: key-skew report (SkewGuard.keySkew) — the heaviest join/groupBy
    // key values with exact counts and table share, the diagnostic to
    // run before keying a 100 TB shuffle. Exact counts via one
    // map-side-combined aggregate (shuffles distinct keys, not rows);
    // count-desc/key-asc total order makes top-k oracle-replayable.
    QueryDef("c5_key_skew",
      (s, dir) => {
        import graft.ops.SkewGuard
        SkewGuard.keySkew(Tables.events(s, dir),
          Seq("event_type"), topK = 5)
          .orderBy(col("n_rows").desc, col("event_type").asc)
      },
      """WITH c AS (SELECT event_type, count(*)::BIGINT AS n_rows
        |    FROM events GROUP BY event_type),
        |t AS (SELECT count(*)::BIGINT AS total FROM events)
        |SELECT event_type, n_rows,
        |  n_rows::DOUBLE / total::DOUBLE AS share
        |FROM c, t ORDER BY n_rows DESC, event_type ASC LIMIT 5""".stripMargin),

    // C6: curriculum/quality decile binning — every document assigned
    // its exact NTILE(10) bucket by length, per-decile stats. The
    // oracle spells it as a global ntile window; the Spark plan must
    // NOT (one task would sort the whole corpus) — Ranking.exactNtile
    // derives the identical bucket from range-partitioned per-
    // partition ranks + broadcast offsets, all stages parallel. The
    // (n_chars, doc_id) order is total, so the bucket of every row is
    // engine-independent.
    QueryDef("c6_quality_bins",
      (s, dir) => {
        import graft.ops.Ranking
        Ranking.exactNtile(
          Tables.documents(s, dir).select("doc_id", "n_chars"),
          buckets = 10,
          sortCols = Seq(col("n_chars").asc, col("doc_id").asc),
          bucketCol = "decile")
          .groupBy("decile")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            min(col("n_chars")).cast("long").as("min_chars"),
            max(col("n_chars")).cast("long").as("max_chars"))
          .orderBy("decile")
      },
      """WITH b AS (SELECT doc_id, n_chars,
        |    ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
        |  FROM documents)
        |SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_docs,
        |  min(n_chars)::BIGINT AS min_chars,
        |  max(n_chars)::BIGINT AS max_chars
        |FROM b GROUP BY decile ORDER BY decile""".stripMargin)
  )
}
