package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued functions over the snapshot format, registered by
  * [[graft.GraftExtensions]] via `injectTableFunction`.
  *
  * `table_changes('catalog.db.table', start[, end])` — the SQL
  * spelling of the batch row-level change feed
  * ([[graft.streaming.ChangeFeedRelation]]): every commit in the
  * inclusive version range decomposed into `_change_type`
  * (insert | delete) rows with `_commit_version`, the shape a SQL CDC
  * consumer joins or rolls up directly. `start`/`end` are commit
  * versions (integer literals) or wall-clock timestamps (string
  * literals, `'yyyy-MM-dd HH:mm:ss'`, resolved in the SESSION
  * timezone exactly like `TIMESTAMP AS OF`); `end` defaults to the
  * current version. The function is sugar over
  * `spark.read.format("graft-snapshots").option("readChangeFeed",
  * "true")` — same relation, same file-pruned distributed scan, no
  * driver materialization — so the reference's funding-upsert →
  * derived-stats loop (scripts/funding_rates_etl.py:100-111) can be
  * followed from pure SQL.
  *
  * Arguments must be literals: the function resolves a table NAME to
  * a relation at analysis time, so there is no row context to
  * evaluate non-literal expressions in — the Delta-parity contract. */
object GraftTableFunctions {

  def tableChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "table_changes wants (table, start[, end]): a table name STRING " +
        "('catalog.db.table'; shorter names resolve in the session's " +
        "current catalog/namespace) plus version (INT) or timestamp " +
        "(STRING 'yyyy-MM-dd HH:mm:ss') bounds, end defaulting to the " +
        s"current version — got ${args.length} argument(s)")
    val session = SparkSession.active
    val given = literal(args.head, "the table name") match {
      case (s: UTF8String, StringType) => s.toString
      case (other, t) => throw new IllegalArgumentException(
        "table_changes: the table name must be a STRING literal " +
          s"'catalog.db.table', got ${t.simpleString} '$other'")
    }
    // one- and two-part names resolve like any other identifier in
    // the session — current catalog, then current namespace; the
    // downstream resolver refuses loudly when the resolved catalog is
    // not a GraftCatalog
    val bridge = org.apache.spark.sql.graft.GraftSparkBridge
    val name = given.split('.').length match {
      case n if n >= 3 => given
      case 2 => bridge.currentCatalogName(session) + "." + given
      case _ => (bridge.currentCatalogName(session) +:
        bridge.currentNamespace(session) :+ given).mkString(".")
    }
    val reader = session.read.format("graft-snapshots")
      .option("table", name).option("readChangeFeed", "true")
      .option(boundOption(args(1), "startingVersion", "startingTimestamp"),
        boundValue(args(1)))
    val bounded =
      if (args.length == 3)
        reader.option(
          boundOption(args(2), "endingVersion", "endingTimestamp"),
          boundValue(args(2)))
      else reader
    bounded.load().queryExecution.analyzed
  }

  private def literal(e: Expression, what: String): (Any, DataType) =
    e match {
      case l: Literal if l.value != null => (l.value, l.dataType)
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be a non-null literal, got " +
          s"'${other.sql}'")
    }

  private def boundOption(e: Expression, versionKey: String,
      timestampKey: String): String =
    literal(e, "a version/timestamp bound")._2 match {
      case IntegerType | LongType => versionKey
      case StringType => timestampKey
      case t => throw new IllegalArgumentException(
        "table_changes: bounds are INT commit versions or STRING " +
          s"'yyyy-MM-dd HH:mm:ss' timestamps, got ${t.simpleString}")
    }

  private def boundValue(e: Expression): String =
    literal(e, "a version/timestamp bound")._1.toString
}
