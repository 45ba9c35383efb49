package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.GraftSparkBridge

import graft.ops.Snapshots

/** Shared translation helpers for the SQL DML commands. */
private[sql] object GraftDml {

  /** A resolved Catalyst predicate/value, re-rooted by NAME so it
    * resolves against the fresh frame the Snapshots API builds (the
    * command runs long after analysis; the original exprIds are
    * meaningless there). Subqueries are refused loudly — the Snapshots
    * DML surface takes self-contained predicates. */
  def toColumn(e: Expression, what: String): Column = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"$what with a subquery is not supported on graft tables — " +
          "materialize the subquery into a source table and MERGE")
    GraftSparkBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** Whether the session opted into deletion-vector (merge-on-read)
    * DML instead of copy-on-write rewrites. */
  def useDv(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.sql.deletionVectors")
      .exists(_.equalsIgnoreCase("true"))
}

/** `DELETE FROM graft.db.t WHERE p` → [[Snapshots.deleteWhere]] (or
  * the deletion-vector [[Snapshots.deleteWhereLight]] when
  * `spark.graft.sql.deletionVectors=true`). Returns the count of a
  * post-delete... nothing: Spark's DELETE returns no rows. */
final case class GraftDeleteCommand(dir: String, tableName: String,
    cond: Expression) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val pred = GraftDml.toColumn(cond, "DELETE")
    if (GraftDml.useDv(spark)) Snapshots.deleteWhereLight(spark, dir, pred)
    else Snapshots.deleteWhere(spark, dir, pred)
    Seq.empty
  }
}

/** `UPDATE graft.db.t SET c = e, ... WHERE p` →
  * [[Snapshots.updateWhere]] (copy-on-write, file-level pruned), or
  * the deletion-vector [[Snapshots.updateWhereLight]] when
  * `spark.graft.sql.deletionVectors=true`. */
final case class GraftUpdateCommand(dir: String, tableName: String,
    assignments: Seq[(String, Expression)],
    cond: Option[Expression]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val pred = cond.map(GraftDml.toColumn(_, "UPDATE")).getOrElse(lit(true))
    val assigns = assignments.map { case (c, e) =>
      c -> GraftDml.toColumn(e, "UPDATE")
    }
    if (GraftDml.useDv(spark))
      Snapshots.updateWhereLight(spark, dir, pred, assigns)
    else Snapshots.updateWhere(spark, dir, pred, assigns)
    Seq.empty
  }
}

/** `MERGE INTO graft.db.t USING s ON t.k = s.k WHEN MATCHED THEN
  * DELETE` (alone) → [[Snapshots.deleteMatching]] — CDC tombstone
  * application, file-level pruned by the tombstones' key footprint. */
final case class GraftMergeDeleteCommand(dir: String, tableName: String,
    source: LogicalPlan, keys: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src0 = GraftSparkBridge.ofRows(spark, source)
    val shaped = src0.select(keys.map { case (tCol, sCol) =>
      src0.col(sCol).as(tCol)
    }: _*)
    Snapshots.deleteMatching(spark, dir, shaped, keys.map(_._1))
    Seq.empty
  }
}

/** `ALTER TABLE graft.db.t ADD CONSTRAINT name CHECK (cond)` →
  * [[Snapshots.setConstraint]] — which validates every existing row
  * against the predicate before the metadata commit, the same
  * existing-rows proof Spark's native constraint flow performs. */
final case class GraftAddConstraintCommand(dir: String, tableName: String,
    name: String, conditionSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Snapshots.setConstraint(spark, dir, name, conditionSql)
    Seq.empty
  }
}

/** `MERGE INTO graft.db.t USING s ON t.k = s.k WHEN MATCHED THEN
  * UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  * [[Snapshots.merge]] — the canonical upsert, which is exactly the
  * reference's ON CONFLICT DO UPDATE shape
  * (`scripts/funding_rates_etl.py:100-111`). The source plan is
  * carried analyzed and re-rooted as a DataFrame at run time; its
  * columns are aligned to target names via the ON equalities.
  * `spark.graft.sql.deletionVectors=true` routes to
  * [[Snapshots.mergeLight]] (matched rows retire by vector). */
final case class GraftMergeCommand(dir: String, tableName: String,
    source: LogicalPlan, colMap: Seq[(String, String)], keys: Seq[String])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src0 = GraftSparkBridge.ofRows(spark, source)
    // project the source into the target's shape: one column per
    // target column, from the source column the merge actions named
    val shaped = src0.select(colMap.map { case (tCol, sCol) =>
      src0.col(sCol).as(tCol)
    }: _*)
    if (GraftDml.useDv(spark))
      Snapshots.mergeLight(spark, dir, shaped, keys)
    else Snapshots.merge(spark, dir, shaped, keys)
    Seq.empty
  }
}
