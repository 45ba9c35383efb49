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

  /** Drop ONE cached relation — for a caller that detected the files
    * under `dir/name.parquet` changed (the cached plan pins its file
    * listing at read time, so a changed dir must re-resolve). */
  def invalidate(spark: SparkSession, dir: String, name: String): Unit = {
    val m = cache.get(spark)
    if (m != null) m.remove((dir, name))
  }

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
  /** `events.ts` arrives in whichever physical type the fixture
    * generator chose, and has CHANGED between rounds: TIMESTAMP(NANOS)
    * (readable only as long nanos under the legacy conf — Spark 4 has
    * no nanosecond timestamp) in earlier fixture sets, plain
    * TIMESTAMP(MICROS) (TIMESTAMP_NTZ) in the current one. Every
    * reader goes through [[events]] or the native-column helpers below,
    * so the repo is layout-agnostic: the helpers dispatch on the
    * SCANNED type once per plan, at zero per-row cost.
    *
    * [[events]] returns `ts` as the session TimestampType (µs, pinned
    * UTC session): long nanos convert via integer division (fixture
    * values are µs-precision so ns→µs truncation is exact; double
    * division would lose precision — ns epochs ≈ 1.7e18 exceed a
    * double's 53-bit mantissa), NTZ casts 1:1 under UTC. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = eventsRawTs(spark, dir)
    df.withColumn("ts", tsTimestamp(df))
  }

  /** `events` with `ts` left EXACTLY as scanned (long nanos or a
    * native timestamp). Time-range predicates belong on this column,
    * built by [[tsAtLeastNanos]]/[[tsBelowNanos]] (see
    * [[graft.pipelines.FundingStats]]): a filter on the raw scan
    * column reaches parquet row-group min/max pruning, while one
    * wrapped in conversion arithmetic does not — at 100 TB that is the
    * difference between scanning 120 days and scanning everything. */
  def eventsRawTs(spark: SparkSession, dir: String): DataFrame = {
    // harmless for the current microsecond layout; required before the
    // FIRST read of a legacy TIMESTAMP(NANOS) file
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

  private def tsType(df: DataFrame): DataType = df.schema("ts").dataType

  /** Native `ts` → session TimestampType (µs, UTC). */
  def tsTimestamp(df: DataFrame): Column = tsType(df) match {
    case LongType => expr("timestamp_micros(ts div 1000)")
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _ => col("ts")
  }

  /** Native `ts` → epoch NANOS long (projection use — conversion
    * arithmetic, so never pushdown-relevant; bound predicates use the
    * literal helpers below instead). Exact: µs-precision fixtures, long
    * arithmetic throughout. */
  def tsNanos(df: DataFrame): Column = tsType(df) match {
    case LongType => col("ts")
    case _ => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
  }

  /** A nanos instant as a literal of the NATIVE ts type — comparisons
    * against the bare scan column, so parquet row-group stats prune. */
  private def tsLiteral(df: DataFrame, nanos: Long): Column = tsType(df) match {
    case LongType => lit(nanos)
    case TimestampNTZType => lit(java.time.LocalDateTime.ofEpochSecond(
      java.lang.Math.floorDiv(nanos, 1000000000L),
      java.lang.Math.floorMod(nanos, 1000000000L).toInt,
      java.time.ZoneOffset.UTC))
    case _ => lit(java.time.Instant.ofEpochSecond(
      java.lang.Math.floorDiv(nanos, 1000000000L),
      java.lang.Math.floorMod(nanos, 1000000000L)))
  }

  /** Pushdown-friendly `ts >= nanos` on the native column. */
  def tsAtLeastNanos(df: DataFrame, nanos: Long): Column =
    col("ts") >= tsLiteral(df, nanos)

  /** Pushdown-friendly `ts < nanos` on the native column. */
  def tsBelowNanos(df: DataFrame, nanos: Long): Column =
    col("ts") < tsLiteral(df, nanos)
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
