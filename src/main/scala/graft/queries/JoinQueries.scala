package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Joins

/** Join operators (SURVEY.md §2.3: J1-J3 + the free outer/anti extras and
  * the as-of alignment extension). Dimension sides broadcast explicitly —
  * at 100 TB the fact side never shuffles for any of these.
  */
object JoinQueries {

  val all: Seq[QueryDef] = Seq(

    // J1: inner equi-join fact ⋈ broadcast dimension
    // (funding_stats_etl.py:101).
    QueryDef("j1_broadcast_join",
      (s, dir) => Joins.withDim(
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
        Tables.part(s, dir).select("p_partkey", "p_name", "p_retailprice")
          .withColumnRenamed("p_partkey", "l_partkey"),
        Seq("l_partkey"))
        .select("l_orderkey", "l_linenumber", "p_name", "p_retailprice")
        .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber, p_name, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // J2: key-universe semi-join (stats only for live symbols,
    // funding_stats_etl.py:70-73).
    QueryDef("j2_semi_join",
      (s, dir) => Joins.semiByKeys(
        Tables.events(s, dir).select("event_id", "user_id", "value"),
        Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("user_id")),
        Seq("user_id"))
        .orderBy("event_id"),
      """SELECT event_id, user_id, value FROM events
        |WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY event_id""".stripMargin),

    // Free extra: anti-join (rows with no dimension match).
    QueryDef("j3_anti_join",
      (s, dir) => Joins.antiByKeys(
        Tables.events(s, dir).select("event_id", "user_id", "value"),
        Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("user_id")),
        Seq("user_id"))
        .orderBy("event_id"),
      """SELECT event_id, user_id, value FROM events
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |                  WHERE c_custkey = user_id AND c_acctbal > 5000)
        |ORDER BY event_id""".stripMargin),

    // Free extra: left outer join (null-extending dimension miss).
    QueryDef("j4_left_outer",
      (s, dir) => Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey").as("o_custkey"), col("c_name"))),
          Seq("o_custkey"), "left")
        .select("o_orderkey", "o_totalprice", "c_name")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_totalprice, c_name
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin),

    // Free extra: range join — equi key + event-time band residual (ship
    // within 60 days of order). The equi key keeps it a hash join with a
    // residual filter, never a nested-loop — the only 100 TB-safe shape.
    QueryDef("j6_range_join",
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .join(broadcast(Tables.orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))),
          Seq("l_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
        .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // Free extra: full outer join — null-extending both sides (customers
    // without orders ∪ orders without customers). Shuffle join by
    // necessity: full-outer cannot broadcast either side.
    QueryDef("j7_full_outer",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"))
        .join(Tables.orders(s, dir)
          .filter(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("c_custkey"), col("o_orderkey")),
          Seq("c_custkey"), "full_outer")
        .select("c_custkey", "c_name", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey"),
      """SELECT COALESCE(c_custkey, o_custkey) AS c_custkey, c_name, o_orderkey
        |FROM customer FULL OUTER JOIN
        |  (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 100000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin),

    // Extension: as-of alignment — for each purchase, the latest view by
    // the same user at-or-before it. Single window pass (no join, no range
    // nested-loop): the 100 TB-safe as-of formulation.
    QueryDef("j5_asof_align",
      (s, dir) => Joins.asOfAligned(
        Tables.events(s, dir)
          .filter(col("event_type").isin("view", "purchase"))
          .select("event_id", "user_id", "event_type", "ts", "value"),
        key = "user_id", time = "ts", value = "value",
        isLeft = col("event_type") === "view",
        isRight = col("event_type") === "purchase",
        tieBreak = Seq(col("event_id").asc))
        .select("event_id", "user_id", "ts", "value", "asof_time", "asof_value")
        .orderBy("event_id"),
      // struct-valued last: (asof_time, asof_value) from the SAME
      // reference row, mirroring Joins.asOfAligned
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |       CAST(a.t AS TIMESTAMP) AS asof_time, a.v AS asof_value
        |FROM (
        |  SELECT event_id, user_id, ts, value, event_type,
        |    last_value(CASE WHEN event_type = 'view'
        |        THEN {'t': ts, 'v': value} END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a
        |  FROM events WHERE event_type IN ('view', 'purchase'))
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin),

    // Two-TABLE as-of join (trades ⋈asof quotes): same semantics as j5
    // but through the separate-frames API — purchases as the probe
    // table, views as the reference table. Still one window pass after
    // a union, never a range nested-loop.
    QueryDef("j8_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select("event_id", "user_id", "ts", "value", "event_type")
        Joins.asOfJoin(
          probe = e.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts", "value"),
          reference = e.filter(col("event_type") === "view"),
          key = "user_id", probeTime = "ts", refTime = "ts",
          refValue = "value",
          refTieBreak = Some("event_id"), probeTieBreak = Some("event_id"))
          .orderBy("event_id")
      },
      // refs sort before probes at equal (ts, tb): side is the
      // second-order key, exactly as the Spark union orders it
      """WITH u AS (
        |  SELECT user_id, ts, value AS v, 0 AS side,
        |         CAST(event_id AS VARCHAR) AS tb,
        |         NULL::BIGINT AS event_id, NULL::DOUBLE AS pvalue
        |    FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, NULL, 1, CAST(event_id AS VARCHAR),
        |         event_id, value
        |    FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |    last_value(CASE WHEN side = 0
        |        THEN {'t': ts, 'v': v} END IGNORE NULLS)
        |      OVER win AS a
        |  FROM u WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts ASC, side ASC, tb ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       pvalue AS value,
        |       CAST(a.t AS TIMESTAMP) AS asof_time, a.v AS asof_value
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin),

    // Free: interval-overlap join — pairs of 6-hour activity windows
    // (high-value views × high-value purchases) that intersect in time.
    // The Spark plan grid-partitions time into day buckets and
    // equi-joins on the bucket (bucketize-then-verify — candidate
    // volume bounded by temporal locality, never |A|·|B|); the oracle
    // runs the honest tiny cross join with the same half-open overlap
    // predicate, so the bucketing must lose and invent nothing.
    QueryDef("j9_interval_overlap",
      (s, dir) => {
        def side(t: String) = Tables.events(s, dir)
          .filter(col("event_type") === t && col("value") > 197)
          .select(col("event_id").as("id"),
            unix_timestamp(col("ts")).as("startSec"),
            (unix_timestamp(col("ts")) + lit(21600L)).as("endSec"))
        Joins.intervalOverlap(side("view"), side("purchase"),
          bucketSeconds = 86400L)
          .orderBy("a_id", "b_id")
      },
      """WITH a AS (SELECT event_id AS a_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS a_s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + 21600 AS a_e
        |  FROM events WHERE event_type = 'view' AND value > 197),
        |b AS (SELECT event_id AS b_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS b_s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + 21600 AS b_e
        |  FROM events WHERE event_type = 'purchase' AND value > 197)
        |SELECT a_id, b_id FROM a, b
        |WHERE a_s < b_e AND b_s < a_e
        |ORDER BY a_id, b_id""".stripMargin),

    // Free: hot-key-split skew join (SkewJoin.skewInnerJoin) — fact
    // rows on keys at-or-over the threshold join via broadcast (no
    // shuffle), the rest via the normal shuffle join; the union must
    // be ROW-identical to the plain join at every threshold, which is
    // exactly what the plain-join oracle checks. Threshold 35 sits
    // just above the fixtures' ~30 rows/key mean so only the upper
    // tail routes hot — both branches execute.
    QueryDef("j10_skew_split_join",
      (s, dir) => {
        import graft.ops.SkewJoin
        SkewJoin.skewInnerJoin(
          Tables.lineitem(s, dir)
            .select("l_partkey", "l_extendedprice"),
          Tables.part(s, dir)
            .select(col("p_partkey").as("l_partkey"), col("p_brand")),
          "l_partkey", hotThreshold = 35L)
          .groupBy("p_brand")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            sum(col("l_extendedprice").cast("decimal(18,4)"))
              .cast("double").as("sum_price"))
          .orderBy("p_brand")
      },
      """SELECT p_brand, count(*)::BIGINT AS n_rows,
        |  (sum(CAST(l_extendedprice AS DECIMAL(18,4))))::DOUBLE AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // Free: bucketed co-located join (Bucketing.writeBucketed) — both
    // fact tables land bucket-sorted on their join key at write time,
    // so the join itself plans with ZERO shuffle exchanges (the
    // fact-fact join shape at 100 TB: move the data once, at write).
    // The oracle is the plain join — layout must not change content;
    // BucketingSpec asserts the no-Exchange plan property itself.
    QueryDef("j11_bucketed_join",
      (s, dir) => {
        import graft.ops.Bucketing
        val stage = s"/tmp/graft_stage/${new java.io.File(dir).getName}"
        // filesPerBucket = 0 (auto): file count follows the optimizer's
        // size estimate, so a grown corpus splits each bucket across
        // parallel write tasks while fixture scales stay one-file-per-
        // bucket (bit-identical layout, oracle unchanged)
        Bucketing.writeBucketed(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_quantity", "l_extendedprice"),
          "j11_lineitem", s"$stage/j11_li", 32,
          Seq("l_orderkey"), Seq("l_orderkey"), filesPerBucket = 0)
        Bucketing.writeBucketed(
          Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
          "j11_orders", s"$stage/j11_ord", 32,
          Seq("o_orderkey"), Seq("o_orderkey"), filesPerBucket = 0)
        Bucketing.table(s, "j11_lineitem")
          .join(Bucketing.table(s, "j11_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
              .as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*)::BIGINT AS n_rows,
        |  (sum(CAST(l_quantity AS DECIMAL(18,4))))::DOUBLE AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  )
}
