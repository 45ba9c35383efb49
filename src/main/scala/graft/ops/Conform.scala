package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema conformance — the guard for the reference's declared-vs-written
  * schema drift (SURVEY.md §1.2: the stats job writes `dollar_volume_24h`
  * where the model declares `volume`, and survives only because its sink
  * drops and recreates the table; our engine makes the contract explicit
  * instead).
  *
  * [[conform]] aligns an incoming frame to a declared schema:
  * columns reordered to declaration order, types cast, missing nullable
  * columns null-filled; extra columns are dropped. Missing NON-nullable
  * columns fail fast — silently inventing required data is how drift
  * corrupts a 100 TB table.
  */
object Conform {

  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = schema.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else if (f.nullable) lit(null).cast(f.dataType).as(f.name)
      else throw new IllegalArgumentException(
        s"missing required column '${f.name}' (declared ${f.dataType.sql}); " +
          s"incoming columns: ${df.columns.mkString(", ")}")
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
