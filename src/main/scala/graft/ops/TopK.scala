package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group and global top-k (SURVEY.md O2).
  *
  * Global top-k uses `orderBy(...).limit(k)` which Spark plans as
  * `TakeOrderedAndProject` — each partition computes its local top-k and
  * only k rows per partition reach the driver-side merge, so it scales to
  * any input size. Per-group top-k is a ranked window (one shuffle on the
  * group key), not a sort of the whole table.
  */
object TopK {

  /** Top k rows per group under `order`, with rank column `rankCol`. */
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Global top k — planned as TakeOrderedAndProject (no full sort). */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Skew-safe per-group top-k: pre-reduce inside salt sub-groups, then
    * rank the ≤ k×buckets survivors per group.
    *
    * A plain ranked window sends EVERY row of a group to one task — a hot
    * key (one symbol = half the fact table) serializes the whole stage.
    * Salting splits the group across `buckets` tasks for the first pass;
    * correctness is free because any row in the group's true top-k is
    * necessarily in its salt bucket's top-k (`order` must be a total
    * order for determinism). AQE's skew handling does NOT cover window
    * functions (only sort-merge joins), so this rewrite is the scale path
    * for skewed rankings.
    *
    * @param salt deterministic salt source column (e.g. a row id); spread
    *             across `buckets` via pmod. */
  def perGroupSalted(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], k: Int, salt: Column, buckets: Int,
      rankCol: String = "rank"): DataFrame = {
    val w1 = Window
      .partitionBy((groupCols :+ "__salt").map(col): _*)
      .orderBy(order: _*)
    val local = df
      .withColumn("__salt", pmod(salt, lit(buckets)))
      .withColumn("__lr", row_number().over(w1))
      .filter(col("__lr") <= k)
      .drop("__salt", "__lr")
    perGroup(local, groupCols, order, k, rankCol)
  }
}
