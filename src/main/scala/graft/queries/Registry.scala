package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: DataFrame implementation + optional DuckDB
  * oracle SQL (omitted only for ops whose semantics aren't
  * SQL-expressible — the driver then records a weaker rows-only check). */
final case class QueryDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, impl: (SparkSession, String) => DataFrame,
      oracle: String): QueryDef = QueryDef(name, impl, Some(oracle))
}
