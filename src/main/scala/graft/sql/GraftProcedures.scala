package graft.sql

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graft.GraftSparkBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}

import graft.ops.Snapshots

/** The `CALL`-able maintenance surface of the snapshot format —
  * Iceberg-style SQL procedures under the catalog's `system`
  * namespace, so the operations that were Scala-API-only (OPTIMIZE,
  * VACUUM, RESTORE, CLONE, history, audit, the one-call maintenance
  * policy) are reachable from any SQL client:
  *
  * {{{
  * CALL graft.system.optimize(table => 'db.t', zorder_by => 'ts,sym')
  * CALL graft.system.vacuum(table => 'db.t', keep_versions => 30)
  * CALL graft.system.restore(table => 'db.t', version => 7)
  * CALL graft.system.clone(source => 'db.t', target => 'db.t_dev')
  * CALL graft.system.history(table => 'db.t')
  * CALL graft.system.maintain(table => 'db.t')
  * }}}
  *
  * Every procedure returns a small result relation (the new version,
  * counts, or the metadata rows themselves) via a [[LocalScan]] —
  * results are driver-sized by construction (these are metadata
  * operations; the heavy lifting happens in the cluster jobs the
  * underlying Snapshots calls launch). */
private[sql] object GraftProcedures {

  /** One procedure: unbound and bound are the same object — binding
    * is trivial because every parameter is a scalar `IN`. */
  private final class Proc(
      val procName: String,
      params: Seq[ProcedureParameter],
      body: (SparkSession, InternalRow) => DataFrame)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft system procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val df = body(SparkSession.active, input)
      val (resultSchema, resultRows) = GraftSparkBridge.collectInternal(df)
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = resultRows
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  private def p(name: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(name, t).build()
  private def pd(name: String, t: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, t).defaultValue(default).build()

  private def str(in: InternalRow, i: Int): String =
    in.getUTF8String(i).toString

  /** Wall-clock in the SESSION timezone, like SQL `TIMESTAMP AS OF`
    * (never `Timestamp.valueOf`, which shifts by the JVM zone). */
  private def sessionTs(what: String, s: String): java.sql.Timestamp =
    try {
      val local = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      val zone = java.time.ZoneId.of(
        SparkSession.active.conf.get("spark.sql.session.timeZone"))
      java.sql.Timestamp.from(local.atZone(zone).toInstant)
    } catch {
      case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"$what must be 'yyyy-MM-dd HH:mm:ss[.fff]' (T separator " +
            s"accepted), got '$s'")
    }
  private def csv(in: InternalRow, i: Int): Seq[String] =
    str(in, i).split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def oneRow(spark: SparkSession, names: Seq[String],
      values: Seq[Any]): DataFrame = {
    val schema = StructType(names.zip(values).map { case (n, v) =>
      org.apache.spark.sql.types.StructField(n, v match {
        case _: Int => IntegerType
        case _: Long => LongType
        case _: Boolean => BooleanType
        case _ => StringType
      }, nullable = false)
    })
    spark.createDataFrame(
      util.Collections.singletonList(org.apache.spark.sql.Row(values: _*)),
      schema)
  }

  /** Build the procedure set against a resolver from the owning
    * catalog ('db.t' or 't' → snapshot directory). */
  def all(dirOf: String => String): Map[String, UnboundProcedure] = Seq(

    new Proc("optimize",
      Seq(p("table", StringType), p("zorder_by", StringType),
        pd("num_files", IntegerType, "8"), pd("bits", IntegerType, "8")),
      (s, in) => {
        val v = Snapshots.optimize(s, dirOf(str(in, 0)), csv(in, 1),
          in.getInt(2), in.getInt(3))
        oneRow(s, Seq("version"), Seq(v))
      }),

    new Proc("optimize_where",
      Seq(p("table", StringType), p("predicate", StringType),
        p("zorder_by", StringType), pd("num_files", IntegerType, "1"),
        pd("bits", IntegerType, "8")),
      (s, in) => {
        val v = Snapshots.optimizeWhere(s, dirOf(str(in, 0)),
          expr(str(in, 1)), csv(in, 2), in.getInt(3), in.getInt(4))
        oneRow(s, Seq("version"), Seq(v))
      }),

    new Proc("optimize_incremental",
      Seq(p("table", StringType), p("zorder_by", StringType),
        pd("num_files", IntegerType, "8"), pd("bits", IntegerType, "8"),
        pd("min_file_bytes", LongType, "0")),
      (s, in) => {
        val v = Snapshots.optimizeIncremental(s, dirOf(str(in, 0)),
          csv(in, 1), in.getInt(2), in.getInt(3),
          minFileBytes = in.getLong(4))
        oneRow(s, Seq("version"), Seq(v))
      }),

    new Proc("compact",
      Seq(p("table", StringType), pd("num_files", IntegerType, "8")),
      (s, in) => {
        val v = Snapshots.compact(s, dirOf(str(in, 0)), in.getInt(1))
        oneRow(s, Seq("version"), Seq(v))
      }),

    // named immutable version refs: VERSION AS OF '<tag>' reads one,
    // vacuum never drops a tagged version (dropTag is the override)
    new Proc("create_tag",
      Seq(p("table", StringType), p("name", StringType),
        pd("version", IntegerType, "-1"), pd("note", StringType, "''")),
      (s, in) => {
        val t = Snapshots.createTag(s, dirOf(str(in, 0)), str(in, 1),
          in.getInt(2), str(in, 3))
        oneRow(s, Seq("name", "version"), Seq(t.name, t.version))
      }),

    new Proc("drop_tag",
      Seq(p("table", StringType), p("name", StringType)),
      (s, in) => {
        val removed = Snapshots.dropTag(s, dirOf(str(in, 0)), str(in, 1))
        oneRow(s, Seq("dropped"), Seq(removed))
      }),

    new Proc("tags",
      Seq(p("table", StringType)),
      (s, in) => {
        import s.implicits._
        Snapshots.tags(s, dirOf(str(in, 0)))
          .map(t => (t.name, t.version, t.createdMs, t.note))
          .toDF("name", "version", "created_ms", "note")
          .orderBy("version", "name")
      }),

    // re-align identity high-water marks with the attained ids
    // (after RESTORE / clone / out-of-band surgery) — Delta's
    // SYNC IDENTITY; empty column = every identity column
    new Proc("sync_identity",
      Seq(p("table", StringType), pd("column", StringType, "''")),
      (s, in) => {
        val c = Option(str(in, 1)).filter(_.nonEmpty)
        val marks = Snapshots.syncIdentity(s, dirOf(str(in, 0)), c)
        oneRow(s, Seq("marks"),
          Seq(marks.toSeq.sortBy(_._1).map { case (k, m) =>
            s"${k.stripPrefix("identity.mark.")}=$m" }.mkString(",")))
      }),

    new Proc("vacuum",
      Seq(p("table", StringType),
        pd("keep_versions", IntegerType, "-1"),
        pd("retain_hours", IntegerType, "-1"),
        pd("force", BooleanType, "false"),
        pd("dry_run", BooleanType, "false")),
      (s, in) => {
        val kv = in.getInt(1); val rh = in.getInt(2)
        val force = in.getBoolean(3)
        val dry = in.getBoolean(4)
        require((kv >= 0) != (rh >= 0),
          "vacuum takes exactly one of keep_versions (count-based) or " +
            "retain_hours (age-based)")
        val (dropped, deleted) =
          if (kv >= 0) Snapshots.vacuum(s, dirOf(str(in, 0)), kv, force,
            dryRun = dry)
          else Snapshots.vacuumOlderThan(s, dirOf(str(in, 0)),
            rh * 3600L * 1000L, force, dryRun = dry)
        oneRow(s, Seq("dropped_versions", "deleted_files", "dry_run"),
          Seq(dropped, deleted, dry))
      }),

    new Proc("copy_into",
      Seq(p("table", StringType), p("source", StringType),
        pd("format", StringType, "'parquet'"),
        pd("pattern", StringType, "''"),
        pd("schema", StringType, "''"), // DDL string, e.g. 'id BIGINT, s STRING'
        pd("force", BooleanType, "false")),
      (s, in) => {
        val ddl = str(in, 4)
        val r = Snapshots.copyInto(s, dirOf(str(in, 0)), str(in, 1),
          format = str(in, 2), pattern = str(in, 3),
          schema = if (ddl.isEmpty) None
            else Some(StructType.fromDDL(ddl)),
          force = in.getBoolean(5))
        oneRow(s,
          Seq("version", "files_loaded", "rows_loaded", "files_skipped"),
          Seq(r.version, r.filesLoaded, r.rowsLoaded, r.filesSkipped))
      }),

    // column NDV statistics for the cost-based optimizer — the
    // procedure spelling of ANALYZE TABLE ... COMPUTE STATISTICS FOR
    // COLUMNS (empty columns = every stat-eligible column)
    new Proc("analyze",
      Seq(p("table", StringType), pd("columns", StringType, "''")),
      (s, in) => {
        val cols = str(in, 1).split(',').map(_.trim).filter(_.nonEmpty)
        val r = Snapshots.analyzeColumns(s, dirOf(str(in, 0)), cols.toSeq)
        oneRow(s, Seq("version", "row_count", "columns"),
          Seq(r.version, r.rowCount, r.columns.mkString(",")))
      }),

    // in-place import: manifest an existing parquet directory's files
    // where they stand (footer stats pass, zero data movement) —
    // Delta's CONVERT TO DELTA; contrast copy_into, which copies bytes
    new Proc("convert",
      Seq(p("table", StringType)),
      (s, in) => {
        val r = Snapshots.convert(s, dirOf(str(in, 0)))
        oneRow(s, Seq("version", "files", "rows"),
          Seq(r.version, r.files, r.rows))
      }),

    new Proc("clean_orphans",
      Seq(p("table", StringType), pd("older_than_hours", IntegerType, "24")),
      (s, in) => {
        val n = Snapshots.cleanOrphans(s, dirOf(str(in, 0)),
          in.getInt(1) * 3600L * 1000L)
        oneRow(s, Seq("deleted_files"), Seq(n))
      }),

    new Proc("restore",
      Seq(p("table", StringType), pd("version", IntegerType, "-1"),
        pd("timestamp", StringType, "''")),
      (s, in) => {
        val kv = in.getInt(1)
        val ts = str(in, 2)
        require((kv >= 0) != ts.nonEmpty,
          "restore takes exactly one of version / timestamp " +
            "(session-timezone 'yyyy-MM-dd HH:mm:ss')")
        val dir = dirOf(str(in, 0))
        val target =
          if (kv >= 0) kv
          else Snapshots.versionAsOf(s, dir, sessionTs("timestamp", ts))
        val v = Snapshots.restore(s, dir, target)
        oneRow(s, Seq("version"), Seq(v))
      }),

    new Proc("clone",
      Seq(p("source", StringType), p("target", StringType),
        pd("version", IntegerType, "-1")),
      (s, in) => {
        val v = Snapshots.shallowClone(s, dirOf(str(in, 0)),
          dirOf(str(in, 1)), in.getInt(2))
        oneRow(s, Seq("version"), Seq(v))
      }),

    new Proc("replicate",
      Seq(p("source", StringType), p("target", StringType),
        p("keys", StringType)),
      (s, in) => {
        val r = Snapshots.replicate(s, dirOf(str(in, 0)),
          dirOf(str(in, 1)), csv(in, 2))
        oneRow(s,
          Seq("target_version", "from_version", "to_version"),
          Seq(r.targetVersion, r.fromVersion, r.toVersion))
      }),

    new Proc("set_bloom_columns",
      Seq(p("table", StringType), p("columns", StringType)),
      (s, in) => {
        val v = Snapshots.setBloomColumns(s, dirOf(str(in, 0)), csv(in, 1))
        oneRow(s, Seq("version"), Seq(v))
      }),

    new Proc("history",
      Seq(p("table", StringType)),
      (s, in) => Snapshots.history(s, dirOf(str(in, 0)))),

    // the operator surface of the vacuum refusal: LIST the recorded
    // streaming-consumer retention floors, and CLEAR a stale one (a
    // consumer gone for good) so vacuum can proceed without force
    new Proc("consumer_floors",
      Seq(p("table", StringType)),
      (s, in) => {
        import s.implicits._
        Snapshots.consumerFloors(s, dirOf(str(in, 0)))
          .map(f => (f.id, f.version, f.note))
          .toDF("consumer_id", "floor_version", "note")
          .orderBy("floor_version", "consumer_id")
      }),

    new Proc("clear_consumer_floor",
      Seq(p("table", StringType), p("consumer_id", StringType)),
      (s, in) => {
        val removed = Snapshots.clearConsumerFloor(s, dirOf(str(in, 0)),
          str(in, 1))
        oneRow(s, Seq("removed"), Seq(removed))
      }),

    new Proc("detail",
      Seq(p("table", StringType)),
      (s, in) => {
        val dir = dirOf(str(in, 0))
        val v = Snapshots.currentVersion(s, dir).getOrElse(
          throw new java.util.NoSuchElementException(s"no table under $dir"))
        val df = Snapshots.read(s, dir)
        val files = df.inputFiles
        val props = Snapshots.tableProperties(s, dir)
        val meta = Snapshots.aggregateFromManifest(s, dir, Nil)
        // statistics-staleness observability: the exact manifest live
        // row count, the version the last ANALYZE read, and the drift
        // between the two — the number an operator watches to decide
        // a re-ANALYZE (the CBO already self-corrects rowCount/NDV
        // from the same accounting; histograms past the bound do not)
        val liveRows = Snapshots.liveRowsExact(s, dir).getOrElse(-1L)
        val analyzedRows = props.get("analyze.rowCount").map(_.toLong)
        val driftPct = (analyzedRows, liveRows) match {
          case (Some(ar), lr) if ar > 0 && lr >= 0 =>
            f"${(lr - ar) * 100.0 / ar}%.1f"
          case _ => ""
        }
        oneRow(s,
          Seq("location", "version", "n_versions_retained", "n_files",
            "size_bytes", "n_rows_meta", "live_rows",
            "analyzed_at_version", "stats_drift_pct", "cluster_columns",
            "optimized_through", "constraints", "properties", "tags",
            "ingested_files"),
          Seq(dir, v, Snapshots.versions(s, dir).size, files.length,
            Snapshots.liveBytes(s, dir, v),
            meta.map(_.head().getLong(0)).getOrElse(-1L),
            liveRows,
            props.getOrElse("analyze.atVersion", ""),
            driftPct,
            Snapshots.clusterColumns(s, dir).mkString(","),
            props.getOrElse("graft.optimize.through", ""),
            Snapshots.constraints(s, dir).toSeq.sorted
              .map { case (n, e) => s"$n: $e" }.mkString("; "),
            props.toSeq.sorted.map { case (k, pv) => s"$k=$pv" }
              .mkString("; "),
            Snapshots.tags(s, dir).sortBy(_.version)
              .map(t => s"${t.name}@v${t.version}").mkString("; "),
            Snapshots.ingestedFiles(s, dir).size))
      }),

    new Proc("audit",
      Seq(p("table", StringType)),
      (s, in) => Snapshots.audit(s, dirOf(str(in, 0)))),

    new Proc("files",
      Seq(p("table", StringType), pd("version", IntegerType, "-1")),
      (s, in) => Snapshots.files(s, dirOf(str(in, 0)), in.getInt(1))),

    new Proc("maintain",
      Seq(p("table", StringType), pd("max_files", IntegerType, "64"),
        pd("target_files", IntegerType, "8"),
        pd("keep_versions", IntegerType, "10"),
        pd("orphan_older_than_hours", IntegerType, "24")),
      (s, in) => {
        val r = Snapshots.maintain(s, dirOf(str(in, 0)), in.getInt(1),
          in.getInt(2), in.getInt(3), in.getInt(4) * 3600L * 1000L)
        oneRow(s,
          Seq("compacted_to", "dropped_versions", "deleted_files",
            "orphans_deleted", "dv_folded_files", "reanalyzed_to"),
          Seq(r.compactedTo.getOrElse(-1), r.versionsDropped,
            r.filesDeleted, r.orphansDeleted, r.dvFoldedFiles,
            r.reanalyzedTo.getOrElse(-1)))
      }),

    new Proc("analyze_if_stale",
      Seq(p("table", StringType),
        pd("max_drift_pct", IntegerType, "20")),
      (s, in) => {
        // the act half of the staleness story (`detail` reports the
        // drift): re-ANALYZE with the stored stats' own scope, only
        // past the threshold — the decision itself reads no data
        val r = Snapshots.analyzeIfStale(s, dirOf(str(in, 0)),
          in.getInt(1).toDouble)
        oneRow(s, Seq("reanalyzed", "version", "row_count"),
          Seq(r.nonEmpty, r.map(_.version).getOrElse(-1),
            r.map(_.rowCount).getOrElse(-1L)))
      })
  ).map(pr => pr.procName -> (pr: UnboundProcedure)).toMap
}
