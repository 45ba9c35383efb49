package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fns

/** Projection / filter / scalar-function operators (SURVEY.md §2.2, §2.8:
  * P1-P10, F1-F13), each exercised against the DuckDB oracle.
  *
  * Determinism rules (FIXTURES.md): every query ends in orderBy on a
  * non-null unique key; no current-time functions; arithmetic mirrors the
  * oracle SQL operation-for-operation.
  */
object CleanseQueries {

  val all: Seq[QueryDef] = Seq(

    // P1: keep-list projection, fixed order (active_futures_etl.py:33-54).
    QueryDef("p1_projection",
      (s, dir) => Tables.part(s, dir)
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey"),
      "SELECT p_partkey, p_name, p_retailprice FROM part ORDER BY p_partkey"),

    // P2: column drop (the _sa_instance_state drop,
    // funding_stats_etl.py:34).
    QueryDef("p2_drop_col",
      (s, dir) => Tables.part(s, dir)
        .drop("p_brand", "p_type")
        .orderBy("p_partkey"),
      """SELECT p_partkey, p_name, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin),

    // P9: existence probe (query(...).first() is None,
    // funding_rates_etl.py:26-29) — LIMIT-1 fast path, no full scan.
    QueryDef("p9_existence_probe",
      (s, dir) => {
        def probe(label: String, pred: org.apache.spark.sql.Column) =
          Tables.orders(s, dir).filter(pred).limit(1)
            .agg((count(lit(1)) === 0).as("is_empty"))
            .select(lit(label).as("probe"), col("is_empty"))
        probe("neg_price", col("o_totalprice") < 0)
          .union(probe("pos_price", col("o_totalprice") > 0))
          .orderBy("probe")
      },
      """SELECT 'neg_price' AS probe, count(*) = 0 AS is_empty
        |FROM (SELECT 1 FROM orders WHERE o_totalprice < 0 LIMIT 1)
        |UNION ALL
        |SELECT 'pos_price', count(*) = 0
        |FROM (SELECT 1 FROM orders WHERE o_totalprice > 0 LIMIT 1)
        |ORDER BY probe""".stripMargin),

    // P3+P4: explicit rename map + bulk camelCase→snake_case schema rename
    // (driver-side metadata only). The fixture columns are snake already,
    // so round-trip through camelCase to prove the mapping.
    QueryDef("p4_snake_rename",
      (s, dir) => {
        val camel = Tables.supplier(s, dir)
          .withColumnRenamed("s_suppkey", "sSuppKey")
          .withColumnRenamed("s_name", "sName")
          .withColumnRenamed("s_nationkey", "sNationKey")
          .withColumnRenamed("s_acctbal", "sAcctBal")
        Fns.snakeCaseColumns(camel)
          .select("s_supp_key", "s_name", "s_nation_key", "s_acct_bal")
          .orderBy("s_supp_key")
      },
      """SELECT s_suppkey AS s_supp_key, s_name, s_nationkey AS s_nation_key,
        |       s_acctbal AS s_acct_bal
        |FROM supplier ORDER BY s_suppkey""".stripMargin),

    // P5/F1: string-suffix predicate (symbol.str.endswith("TM"),
    // active_futures_etl.py:30).
    QueryDef("p5_endswith_filter",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderpriority").endsWith("LOW"))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE ends_with(o_orderpriority, 'LOW') ORDER BY o_orderkey""".stripMargin),

    // P6: equality predicate (quote_currency == "USDT",
    // active_spot_pairs_etl.py:57).
    QueryDef("p6_eq_filter",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value")
        .orderBy("event_id"),
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin),

    // P7: range predicate on event time (the 120-day slice,
    // funding_stats_etl.py:25-27) — applied to the raw nanos column so it
    // pushes to the parquet scan.
    QueryDef("p7_time_range",
      (s, dir) => {
        val ev = Tables.eventsRawTs(s, dir)
        ev.filter(
            Tables.tsAtLeastNanos(ev, 1704672000000000000L) && // 2024-01-08
              Tables.tsBelowNanos(ev, 1705276800000000000L))   // 2024-01-15
          .select(col("event_id"), Tables.tsTimestamp(ev).as("ts"))
          .orderBy("event_id")
      },
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |ORDER BY event_id""".stripMargin),

    // P10/F12: computed columns — annualize a daily rate
    // (lending_data_etl.py:48-50: annualized = daily × 365).
    QueryDef("p10_computed_annualize",
      (s, dir) => Tables.events(s, dir)
        .withColumn("daily_rate", col("value") / 100.0)
        .withColumn("annualized_rate", Fns.annualize(col("value") / 100.0, 1))
        .select("event_id", "daily_rate", "annualized_rate")
        .orderBy("event_id"),
      """SELECT event_id, value / 100.0 AS daily_rate,
        |       value / 100.0 * 365.0 AS annualized_rate
        |FROM events ORDER BY event_id""".stripMargin),

    // C1: constraint report — the checks Postgres enforced for the
    // reference (pkey uniqueness, NOT NULL; models.py) plus referential
    // coverage and a range check, validated explicitly on the parquet
    // store (which enforces nothing).
    QueryDef("c1_constraint_report",
      (s, dir) => {
        import graft.ops.Quality
        val events = Tables.events(s, dir)
        Quality.report(Seq(
          Quality.pkeyUnique(events, Seq("event_id")),
          Quality.pkeyUnique(Tables.lineitem(s, dir),
            Seq("l_orderkey", "l_linenumber")),
          Quality.notNull(events, "user_id"),
          Quality.fkCovered(events, "user_id",
            Tables.customer(s, dir), "c_custkey"),
          Quality.inRange(events, "value", 0.0, 1e6)))
          .orderBy("check_name")
      },
      """SELECT 'pkey_unique(event_id)' AS check_name,
        |  (count(*) - count(DISTINCT event_id))::BIGINT AS violations,
        |  count(*) = count(DISTINCT event_id) AS passed FROM events
        |UNION ALL
        |SELECT 'pkey_unique(l_orderkey,l_linenumber)',
        |  (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT,
        |  count(*) = count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
        |UNION ALL
        |SELECT 'not_null(user_id)',
        |  (count(*) - count(user_id))::BIGINT,
        |  count(*) = count(user_id) FROM events
        |UNION ALL
        |SELECT 'fk_covered(user_id->c_custkey)',
        |  (SELECT count(*) FROM events e WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))::BIGINT,
        |  (SELECT count(*) FROM events e WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) = 0
        |UNION ALL
        |SELECT 'in_range(value)',
        |  coalesce(sum(CASE WHEN value < 0.0 OR value > 1000000.0
        |                    THEN 1 ELSE 0 END), 0)::BIGINT,
        |  coalesce(sum(CASE WHEN value < 0.0 OR value > 1000000.0
        |                    THEN 1 ELSE 0 END), 0) = 0 FROM events
        |ORDER BY check_name""".stripMargin),

    // F2: split "BASE-QUOTE" into parts (active_spot_pairs_etl.py:49-54).
    QueryDef("f2_split_currency",
      (s, dir) => Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          split(col("o_orderpriority"), "-").getItem(0).as("priority_code"),
          split(col("o_orderpriority"), "-").getItem(1).as("priority_label"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, split_part(o_orderpriority, '-', 1) AS priority_code,
        |       split_part(o_orderpriority, '-', 2) AS priority_label
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // F3: substring replace ("XBT"→"BTC", active_futures_etl.py:65).
    QueryDef("f3_replace",
      (s, dir) => Tables.part(s, dir)
        .select(col("p_partkey"),
          expr("replace(p_type, 'STANDARD', 'STD')").as("p_type_short"))
        .orderBy("p_partkey"),
      """SELECT p_partkey, replace(p_type, 'STANDARD', 'STD') AS p_type_short
        |FROM part ORDER BY p_partkey""".stripMargin),

    // F4: camelCase→snake_case as a data function (regex with lookahead).
    QueryDef("f4_snake_case_data",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          Fns.snakeCaseCol(concat(
            upper(expr("substr(event_type, 1, 1)")),
            expr("substr(event_type, 2)"), lit("EventKind")))
            .as("snake_name"))
        .orderBy("event_id"),
      // DuckDB regex is RE2 (no lookarounds): insert '_' before every
      // capital then strip the leading one — same result as the
      // lookbehind/lookahead form Spark runs.
      """SELECT event_id,
        |  lower(regexp_replace(regexp_replace(
        |    upper(substr(event_type, 1, 1)) || substr(event_type, 2) || 'EventKind',
        |    '([A-Z])', '_\1', 'g'), '^_', '')) AS snake_name
        |FROM events ORDER BY event_id""".stripMargin),

    // F5+F6+F7: epoch millis → timestamp → trunc-to-second → time-of-day
    // string (funding_rates_etl.py:87-91, active_futures_etl.py:68-82).
    QueryDef("f5_f6_f7_epoch_roundtrip",
      (s, dir) => {
        val ev = Tables.eventsRawTs(s, dir)
        ev.withColumn("__ns", Tables.tsNanos(ev))
          .select(
            col("event_id"),
            expr("__ns div 1000000").as("ts_ms"),
            Fns.truncSecond(Fns.epochMillisToTs(expr("__ns div 1000000")))
              .as("ts_sec"),
            Fns.timeOfDay(Fns.epochMillisToTs(expr("__ns div 1000000")))
              .as("time_of_day"))
          .orderBy("event_id")
      },
      """SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms,
        |  date_trunc('second', epoch_ms(epoch_ns(ts) // 1000000)) AS ts_sec,
        |  strftime(epoch_ms(epoch_ns(ts) // 1000000), '%H:%M:%S') AS time_of_day
        |FROM events ORDER BY event_id""".stripMargin),

    // F9: ceiling 5-minute bucket (lending_data_etl.py:54-57) — exact
    // boundaries round UP to the next bucket, all integer arithmetic.
    QueryDef("f9_ceil_bucket",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), col("ts"),
          Fns.ceilBucket(col("ts"), 300).as("bucket_ts"))
        .orderBy("event_id"),
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        |  make_timestamp(epoch_us(CAST(ts AS TIMESTAMP))
        |    - epoch_us(CAST(ts AS TIMESTAMP)) % 300000000 + 300000000) AS bucket_ts
        |FROM events ORDER BY event_id""".stripMargin),

    // F10+F13: JSON field extraction + string→double cast
    // (lending_data_etl.py:25,49 — nested payload field to float).
    QueryDef("f13_json_extract_cast",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("double").as("k_val"))
        .orderBy("event_id"),
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val
        |FROM events ORDER BY event_id""".stripMargin)
  )
}
