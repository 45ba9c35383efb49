package graft

import org.apache.spark.sql.{GraftSql, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayCosine, ArrayDotProduct}

/** SQL-surface registration of the graft library: custom expressions
  * plus the snapshot-table SQL bridge.
  *
  * Two paths:
  *   - config-time: `--conf spark.sql.extensions=graft.GraftExtensions`
  *     injects everything into every session of the application;
  *   - runtime: [[GraftFunctions.register]] adds the functions to an
  *     already-built session (used by the verify harness, whose session
  *     we may not own). The snapshot SQL bridge is config-time only —
  *     analyzer rules cannot be injected after session build.
  *
  * Functions:
  *   - `array_dot(a, b)` — codegen'd left-fold dot product
  *     ([[ArrayDotProduct]]);
  *   - `array_cosine(a, b)` — dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))),
  *     the same operation order as [[graft.functions.VectorFns.cosine]].
  *
  * Snapshot SQL bridge ([[graft.sql.GraftResolution]], paired with
  * [[graft.sql.GraftCatalog]]): compiles reads of catalog-registered
  * snapshot tables to the native vectorized parquet scan and routes
  * `MERGE INTO`/`DELETE FROM`/`UPDATE` to the snapshot commit
  * machinery. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      // catalog metadata must name each function's OWN implementing class
      val implClass = name match {
        case "array_cosine" => classOf[ArrayCosine].getName
        case _              => classOf[ArrayDotProduct].getName
      }
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(implClass, name), builder))
    }
    // persistent catalog views, in two pieces (see graft.sql.GraftViews):
    // the parser hook re-targets view DDL aimed at a graft catalog
    // before ResolveSessionCatalog can reject it, and the resolution
    // rule expands view reads INSIDE the fixed point (an unresolved
    // view reference has to expand before analysis gives up on it)
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftViewAwareParser(() => session, delegate))
    ext.injectResolutionRule(session =>
      graft.sql.GraftViewResolution(session))
    ext.injectPostHocResolutionRule(session =>
      graft.sql.GraftResolution(session))
    // SQL table-valued functions: the batch change feed from pure SQL
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.sql.GraftTableFunctions.getClass.getName,
        "table_changes"),
      (es: Seq[Expression]) => graft.sql.GraftTableFunctions.tableChanges(es)))
  }
}

object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_dot" -> (es => ArrayDotProduct(es(0), es(1))),
    "array_cosine" -> (es => ArrayCosine(es(0), es(1))))

  /** Idempotent: register graft's SQL functions on `spark`. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftSql.registerFunction(spark, name, builder)
    }
}
