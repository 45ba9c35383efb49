package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven per-column profiling (deequ-style observability): row,
  * null and distinct counts plus typed min/max for EVERY column of any
  * DataFrame — the first thing a pipeline runs on an unfamiliar or
  * drifting table, as a library op instead of a hand-written per-table
  * query (the reference monitors fixed tables — the three ETLs under
  * scripts/ — but a data platform profiles whatever lands).
  *
  * Output: one row per input column —
  * (col_name, n_rows, n_null, n_distinct, min_num, max_num, min_str,
  * max_str). Numeric columns fill the num lane (exact long→double
  * casts), strings the str lane, temporal/boolean columns render their
  * min/max into the str lane (ISO order = lexical order); other types
  * (arrays, structs, binary) get counts only, with map-bearing columns'
  * n_distinct computed over their to_json encoding (Spark SQL defines
  * no map equality). No cross-type formatting, so the report replays
  * exactly against a SQL oracle.
  *
  * Scale shape: ONE pass over the table — a single aggregate computes
  * every column's metrics together, then the 1-row result pivots to the
  * report rows driver-free (explode of a literal struct array; no
  * per-column re-scan, which is what a naive union-of-aggregates costs —
  * C full scans for C columns). Exact distinct counts plan one Expand
  * (×C rows map-side, partially aggregated before the shuffle); for
  * very wide tables at corpus scale pass `exactDistinct = false` to use
  * HyperLogLog sketches instead — no Expand, same single scan, ±2%
  * n_distinct. */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
      _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Temporal/boolean: orderable, rendered into the string lane (their
    * canonical string form preserves order). */
  private def isStringish(dt: DataType): Boolean = dt match {
    case _: StringType | _: TimestampType | _: TimestampNTZType |
      _: DateType | _: BooleanType => true
    case _ => false
  }

  /** Map-bearing types are unorderable AND unhashable in Spark SQL —
    * both countDistinct and approx_count_distinct are rejected at
    * analysis time, anywhere a map appears in the type tree. */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => containsMap(et)
    case StructType(fs) => fs.exists(f => containsMap(f.dataType))
    case _ => false
  }

  def profile(df: DataFrame, exactDistinct: Boolean = true): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "profile: empty schema")
    val aggs: Seq[Column] = count(lit(1)).cast("long").as("__nr") +:
      fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(f.name)
        // Spark rejects distinct aggregation on map-bearing types at
        // analysis time (maps are neither orderable nor hashable —
        // map equality itself is undefined in Spark SQL), so distinct
        // counts for those run over the to_json canonical encoding: the
        // profile stays one pass over ANY DataFrame, at the documented
        // cost that n_distinct for maps counts distinct ENCODINGS.
        val distArg = if (containsMap(f.dataType)) to_json(c) else c
        val dist =
          if (exactDistinct) countDistinct(distArg)
          else approx_count_distinct(distArg)
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).cast("long").as(s"__nu_$i"),
          dist.cast("long").as(s"__nd_$i")) ++
          (if (isNumeric(f.dataType))
            Seq(min(c).cast("double").as(s"__mn_$i"),
              max(c).cast("double").as(s"__mx_$i"))
          else if (isStringish(f.dataType))
            Seq(min(c).cast("string").as(s"__mn_$i"),
              max(c).cast("string").as(s"__mx_$i"))
          else Nil)
      }.toSeq
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      val (mnNum, mxNum, mnStr, mxStr) =
        if (isNumeric(f.dataType))
          (col(s"__mn_$i"), col(s"__mx_$i"),
            lit(null).cast("string"), lit(null).cast("string"))
        else if (isStringish(f.dataType))
          (lit(null).cast("double"), lit(null).cast("double"),
            col(s"__mn_$i"), col(s"__mx_$i"))
        else
          (lit(null).cast("double"), lit(null).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
      struct(
        lit(f.name).as("col_name"), col("__nr").as("n_rows"),
        col(s"__nu_$i").as("n_null"), col(s"__nd_$i").as("n_distinct"),
        mnNum.as("min_num"), mxNum.as("max_num"),
        mnStr.as("min_str"), mxStr.as("max_str"))
    }
    one.select(explode(array(rows.toIndexedSeq: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
