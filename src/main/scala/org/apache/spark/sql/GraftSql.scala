package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * `Column` onto ColumnNode, hiding the Expression constructor). Standard
  * extension-library idiom: one object inside the `org.apache.spark.sql`
  * package, everything else stays in `graft`.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-root a batch frame as a STREAMING frame (isStreaming = true) —
    * what a v1 `Source.getBatch` must hand MicroBatchExecution. The
    * batch plan is materialized to its InternalRow RDD first, so the
    * wrapped plan is self-contained per micro-batch. */
  def streamingFrame(df: DataFrame): DataFrame = {
    val ss = df.sparkSession.asInstanceOf[classic.SparkSession]
    ss.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** Re-root a streaming micro-batch frame as a BATCH frame — what a v1
    * `Sink.addBatch` needs before handing rows to a batch writer (the
    * incoming frame's plan is streaming-tagged; batch actions on it
    * would re-plan against the source). [[streamingFrame]]'s inverse. */
  def batchFrame(df: DataFrame): DataFrame = {
    val ss = df.sparkSession.asInstanceOf[classic.SparkSession]
    ss.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** Idempotent runtime registration of a SQL function on an existing
    * session (the config-time path is `spark.sql.extensions` →
    * `graft.GraftExtensions`; this one serves sessions the caller didn't
    * build, e.g. the verify driver's). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
