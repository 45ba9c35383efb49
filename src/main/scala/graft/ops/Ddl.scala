package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Idempotent DDL (SURVEY.md S11 — `Base.metadata.create_all`
  * models.py:82 and the raw `CREATE TABLE IF NOT EXISTS`
  * kucoin_lending_dag.py:87-98), as catalog operations over parquet
  * locations: re-running is a no-op, matching the reference's
  * every-5-minutes `create_tables` task.
  */
object Ddl {

  /** CREATE TABLE IF NOT EXISTS name (<schema>) USING PARQUET
    * [LOCATION path]. */
  def ensureTable(spark: SparkSession, name: String, schema: StructType,
      location: Option[String] = None): Unit = {
    val cols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val loc = location.map(p => s" LOCATION '$p'").getOrElse("")
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$name` ($cols) USING PARQUET$loc")
  }
}
