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
}
