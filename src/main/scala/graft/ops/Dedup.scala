package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-subset deduplication (SURVEY.md A3).
  *
  * The reference's `drop_duplicates(subset=[...])` keeps the *first* row in
  * frame order (funding_rates_etl.py:95). Spark's `dropDuplicates` keeps an
  * *arbitrary* row — fine when duplicates are exact copies, wrong when they
  * differ in non-key columns. [[keepFirst]] restores pandas semantics
  * deterministically with a `row_number` tie-break.
  *
  * Scale note: one hash-partition shuffle on the key columns; with AQE on,
  * skewed keys split automatically. For the common telemetry case
  * (duplicates are re-deliveries inside a time window), prefer
  * `dropDuplicatesWithinWatermark` in streaming (see graft.streaming).
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate removal over a full row or column subset where rows
    * are true copies — Spark-native, shuffle on the subset hash. */
  def exact(df: DataFrame, subset: Seq[String]): DataFrame =
    if (subset.isEmpty) df.distinct() else df.dropDuplicates(subset)
}
