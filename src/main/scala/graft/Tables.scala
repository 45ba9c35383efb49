package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated fixture tables (TESTDATA.md).
  *
  * At 100 TB scale these would be partitioned/bucketed catalog tables; here
  * they are single parquet files per table. All downstream operators are
  * written so that filters and projections reach the parquet scan
  * (predicate pushdown + column pruning), which is what makes the same code
  * survive the scale-up.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast on a 1000-executor cluster even at
    * large SF (dimension tables stay fixed-size per TESTDATA.md). */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  /** Per-session DataFrame cache: reusing the same resolved relation
    * across the 70-query harness avoids re-listing files and re-reading
    * parquet footers per query — pure metadata reuse, no data caching
    * (read-only fixtures, so staleness is impossible here; a mutable
    * store would need invalidation instead).
    *
    * Lifetime is deliberate and explicit: a cached DataFrame strongly
    * references its SparkSession, so NO weak-keyed scheme can make these
    * entries collectable (the value would resurrect the key — the
    * classic WeakHashMap self-reference pitfall). Entries are
    * metadata-sized (resolved plans), bounded by #sessions × #tables,
    * and live until [[invalidate]] is called for a stopped session. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  /** Drop a (stopped) session's cached plans so the session and its
    * plans can be collected. */
  def invalidate(spark: SparkSession): Unit = cache.remove(spark)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache
      .computeIfAbsent(spark, _ =>
        scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
      .getOrElseUpdate((dir, name),
        spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its microsecond TimestampType. Read it as a long (nanos since
    * epoch) and convert with integer division — the fixture values are
    * µs-precision so the ns→µs truncation is exact. (Double division would
    * lose precision: ns epochs ≈ 1.7e18 exceed a double's 53-bit mantissa.)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** `events` with `ts` left as raw nanos (long). Time-range predicates
    * should be applied to this column as long literals (see
    * [[graft.pipelines.FundingStats]]): a filter on the raw scan column
    * reaches parquet row-group min/max pruning, while one wrapped in
    * conversion arithmetic does not — at 100 TB that is the difference
    * between scanning 120 days and scanning everything. */
  def eventsRawTs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
