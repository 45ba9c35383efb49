package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSql, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.ops.Snapshots

/** Streaming READ of a [[Snapshots]] table — the source-side complement
  * of `Snapshots.idempotentAppend`: one writer streams INTO the
  * versioned store, any number of downstream queries stream OUT of it,
  * each micro-batch exactly the rows of newly committed versions.
  *
  *   spark.readStream.format("graft-snapshots")
  *     .option("path", dir).load()
  *
  * Offsets ARE snapshot versions: `getOffset` is the table's current
  * version (a manifest listing — no data touched), `getBatch(v1, v2)`
  * is [[Snapshots.changesSince]] — purely the files appended between
  * the two pinned manifests, so a trigger costs exactly the new data
  * regardless of table size, and replays after restart re-read the
  * same immutable files (versions never change under a reader). An
  * overwrite/compact between offsets makes appended-files a lie, and
  * the source FAILS the query rather than feeding wrong deltas (the
  * changesSince contract): re-start the consumer from a full read, or
  * pause maintenance while consumers stream.
  *
  * `startingVersion` (default 0 = everything) makes the first batch
  * skip history already handled elsewhere.
  *
  * Reference anchor: the 5-minute tick pipelines
  * (dags/kucoin_main_dag.py:27-28) re-read their upstream tables each
  * tick; this source is that loop with per-tick cost = per-tick data.
  */
class SnapshotSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snapshots"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshots source requires .option(\"path\", <tableDir>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      Snapshots.read(sqlContext.sparkSession, dirOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotSource(sqlContext, dirOf(parameters),
      parameters.get("startingVersion").map(_.toInt).getOrElse(0))
}

private[streaming] class SnapshotSource(sqlContext: SQLContext,
    dir: String, startVersion: Int) extends Source {

  private val spark = sqlContext.sparkSession

  override val schema: StructType = Snapshots.read(spark, dir).schema

  /** Restart hands offsets back as SerializedOffset json — LongOffset's
    * json is just the number, so parsing json covers both forms. */
  private def version(o: Offset): Int = o.json.trim.toInt

  override def getOffset: Option[Offset] =
    Snapshots.currentVersion(spark, dir)
      .filter(_ > startVersion)
      .map(v => LongOffset(v.toLong))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(version).getOrElse(startVersion)
    GraftSql.streamingFrame(
      Snapshots.changesSince(spark, dir, from, version(end)))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
