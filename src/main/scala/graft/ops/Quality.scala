package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the replacement for the constraints
  * the reference gets from Postgres for free (primary-key uniqueness and
  * NOT NULL, models.py:14-79; referential integrity between the funding
  * facts and the futures dimension is implicit in its ingest loop). A
  * parquet store enforces none of these, so the engine validates them
  * explicitly; run after each load, fail the pipeline on violations.
  *
  * Each check is one aggregation returning a single report row
  * (check_name, violations, passed); [[report]] unions them — every
  * check is a full-scan aggregate with map-side combine, no check ever
  * collects data to the driver.
  */
object Quality {

  final case class Check(name: String, df: () => DataFrame)

  private def row(name: String, violations: org.apache.spark.sql.Column) =
    (df: DataFrame) => df
      .agg(coalesce(violations.cast("long"), lit(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"),
        (col("violations") === 0).as("passed"))

  /** Primary-key uniqueness: count of rows beyond the first per key. */
  def pkeyUnique(df: DataFrame, keys: Seq[String]): DataFrame =
    row(s"pkey_unique(${keys.mkString(",")})",
      count(lit(1)) - countDistinct(struct(keys.map(col): _*)))(df)

  /** NOT NULL on a column. */
  def notNull(df: DataFrame, column: String): DataFrame =
    row(s"not_null($column)",
      count(lit(1)) - count(col(column)))(df)

  /** Referential coverage: fact keys with no match in the dimension.
    * (Left-anti + count — the dimension side broadcasts.) */
  def fkCovered(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    fact.select(col(factKey))
      .join(broadcast(dim.select(col(dimKey).as(factKey))),
        Seq(factKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(s"fk_covered($factKey->$dimKey)").as("check_name"),
        col("violations"), (col("violations") === 0).as("passed"))

  /** Value-range check: rows outside [lo, hi]. */
  def inRange(df: DataFrame, column: String, lo: Double, hi: Double): DataFrame =
    row(s"in_range($column)",
      sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L)))(df)

  /** Union a set of checks into one report. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
