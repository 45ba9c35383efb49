package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse an event /
  * snapshot stream into per-key validity intervals, one row per attribute
  * CHANGE. The classic warehouse operator behind "what was this entity's
  * state at time T" — the reference's dimension refreshes
  * (/root/reference/scripts/kucoin_data_etl.py:21-37) truncate-and-reload
  * the CURRENT state; this derives the full history the reload discards.
  *
  * Scale shape: two window passes sharing ONE partitioning on `key` —
  * change detection (lag) and interval close (lead) both run inside the
  * same per-key sort, so the whole operator is a single shuffle
  * regardless of input size. No joins, no driver state.
  *
  * Determinism: (key, time, tieBreak) must totally order the input —
  * same contract as [[Joins.asOfAligned]] / [[Sessionize]]. Attribute
  * comparison is null-safe (`<=>`): a null attribute value is a state
  * like any other, opening and closing intervals on transition.
  */
object Scd {

  /** Build the SCD2 history for one attribute column.
    *
    * @param df       input rows (one per observation)
    * @param key      entity key column name
    * @param time     observation-time column name (becomes `valid_from`)
    * @param attr     tracked attribute column name
    * @param tieBreak extra orderBy columns completing the per-key total
    *                 order at equal `time`
    * @return one row per (key, change): key, attr, valid_from, valid_to
    *         (null = still current), is_current, change_seq (1-based
    *         change index per key — (key, change_seq) is a total order
    *         even when distinct changes share a timestamp)
    */
  def scd2(df: DataFrame, key: String, time: String, attr: String,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val order = col(time).asc +: tieBreak
    val w = Window.partitionBy(key).orderBy(order: _*)
    // change detection: keep the first row of every run of equal attr
    // values (null-safe, so null->X and X->null are both transitions)
    val changes = df
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col(attr) <=> col("__prev")))
      .drop("__prev", "__first")
    // interval close: the next change's valid_from ends this interval.
    // Same (key, order) window spec as above -> Catalyst reuses the
    // partitioning; one shuffle end-to-end.
    changes
      .withColumn("valid_to", lead(col(time), 1).over(w))
      .withColumn("change_seq", row_number().over(w).cast("long"))
      .select(col(key), col(attr),
        col(time).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        col("change_seq"))
  }
}
