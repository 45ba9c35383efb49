package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: group a keyed event stream into activity sessions
  * separated by ≥ `gapSeconds` of silence.
  *
  * Batch form is gaps-and-islands over ONE window partitioning
  * (`partitionBy(key).orderBy(time)`): lag marks session starts, a
  * cumulative sum numbers them, a groupBy aggregates per session — so the
  * whole operator costs a single shuffle on the key, and the session
  * aggregation reuses that partitioning (Exchange reuse; no second
  * shuffle of the fact). Streaming form is the native
  * `session_window(ts, gap)` (see WindowedAggSpec) — same semantics,
  * state-store backed, watermark-bounded.
  */
object Sessionize {

  /** One row per (key, session): session_seq (1-based per key, in time
    * order), session_start/end, n_events, plus `aggs` over the session's
    * rows. */
  def sessions(df: DataFrame, key: String, time: String, gapSeconds: Long,
      tieBreak: Seq[Column] = Nil,
      aggs: Seq[(Column, String)] = Nil): DataFrame = {
    val byTime = Window.partitionBy(key)
      .orderBy(col(time).asc +: tieBreak: _*)
    val newSession = when(
      col(time).cast("long") -
        lag(col(time).cast("long"), 1).over(byTime) > gapSeconds ||
        lag(col(time), 1).over(byTime).isNull, 1L).otherwise(0L)
    val aggCols = Seq(
      min(col(time)).as("session_start"),
      max(col(time)).as("session_end"),
      count(lit(1)).as("n_events")) ++
      aggs.map { case (c, name) => c.as(name) }
    df.withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(byTime.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("session_seq"))
      .agg(aggCols.head, aggCols.tail: _*)
  }
}
