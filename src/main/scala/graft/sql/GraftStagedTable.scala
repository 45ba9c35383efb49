package graft.sql

import java.util

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import graft.ops.Snapshots

/** The staged handle behind [[GraftCatalog]]'s atomic
  * CTAS / `REPLACE TABLE` / `CREATE OR REPLACE TABLE`: the CTAS query
  * writes data files under the target directory through the ordinary
  * V1 write bridge, but NO manifest references them until
  * [[commitStagedChanges]] lands schema + properties + CHECK
  * constraints + data as ONE CAS commit
  * ([[Snapshots.commitReplaceTable]]). A failed query calls
  * [[abortStagedChanges]], which deletes the staged files — either
  * way there is no observable half-state: readers see the previous
  * table version (or no table) until the single commit instant.
  *
  * The `mustExist` / `mustNotExist` flags re-assert the DDL verb's
  * existence semantics AT COMMIT TIME, so a table created or dropped
  * by a racing writer between analysis and commit fails the statement
  * instead of silently inverting CREATE/REPLACE. */
private[sql] final class GraftStagedTable(
    identName: String,
    dir: String,
    declaredSchema: StructType,
    props: Map[String, String],
    constraints: Map[String, String],
    mustExist: Boolean,
    mustNotExist: Boolean,
    postCommit: () => Unit = () => ()) extends StagedTable
    with SupportsWrite {

  private def spark: SparkSession = SparkSession.active
  private val staged =
    scala.collection.mutable.ArrayBuffer[Snapshots.StagedReplace]()

  override def name(): String = identName
  override def schema(): StructType = declaredSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // REPLACE TABLE AS SELECT arrives as an overwrite of the staged
      // (conceptually empty) table — there is nothing to truncate, the
      // staged data IS the table content either way
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: Dataset[Row], ow: Boolean): Unit =
              staged.synchronized {
                staged += Snapshots.stageReplaceData(data.toDF(), dir,
                  props)
              }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    Snapshots.commitReplaceTable(spark, dir, declaredSchema, props,
      constraints, staged.synchronized(staged.toSeq),
      mustExist = mustExist, mustNotExist = mustNotExist)
    // the catalog's table/view mutual-exclusion re-check (a racing
    // CREATE VIEW of the same name) — only wired for the
    // created-from-nothing verbs, where a rollback deletes nothing
    // that predates this statement
    postCommit()
  }

  override def abortStagedChanges(): Unit =
    Snapshots.abortStagedData(spark, dir, staged.synchronized(staged.toSeq))
}
