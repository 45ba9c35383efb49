package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, AttributeSet, EqualTo, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{AddCheckConstraint, Aggregate, Assignment, DeleteAction, DeleteFromTable, Filter => LogicalFilter, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.ops.Snapshots

/** The analysis bridge between Spark SQL and the graft snapshot
  * format, injected by [[GraftExtensions]] as a post-hoc resolution
  * rule (runs once, after the plan is fully resolved):
  *
  *   - READ relations over a [[GraftTable]] are replaced by the native
  *     parquet plan [[graft.ops.Snapshots.read]] builds — so a
  *     `SELECT` against `graft.db.t` compiles to the same vectorized
  *     columnar `FileSourceScanExec` (with filter pushdown, column
  *     pruning, deletion vectors, column mapping) a Scala-API read
  *     gets. Output attribute ids of the replaced relation are
  *     preserved via an aliasing Project, so the surrounding resolved
  *     plan is untouched.
  *   - `DELETE FROM` / `UPDATE` / `MERGE INTO` over a [[GraftTable]]
  *     become runnable commands over the existing Snapshots DML
  *     machinery (copy-on-write by default; deletion vectors when
  *     `spark.graft.sql.deletionVectors=true`).
  *
  * Write targets (`INSERT`) are deliberately NOT rewritten — they
  * flow through the table's V1 write bridge (see
  * [[GraftTable.newWriteBuilder]]). */
final case class GraftResolution(session: SparkSession)
    extends Rule[LogicalPlan] {

  /** A (possibly aliased) DSv2 relation over a graft table. */
  private object GraftRel {
    def unapply(plan: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
      plan match {
        case r: DataSourceV2Relation => r.table match {
          case t: GraftTable => Some((r, t))
          case _ => None
        }
        case SubqueryAlias(_, child) => unapply(child)
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d.table match {
      case GraftRel(_, t) =>
        requireCurrent(t, "DELETE FROM")
        GraftDeleteCommand(t.dir, t.identName,
          ShieldedExpr(convertExprReads(d.condition)))
      case _ => convertReads(plan)
    }
    case u: UpdateTable => u.table match {
      case GraftRel(_, t) =>
        requireCurrent(t, "UPDATE")
        GraftUpdateCommand(t.dir, t.identName,
          u.assignments.map(a => topLevelName(a.key, "UPDATE") ->
            ShieldedExpr(convertExprReads(a.value))),
          u.condition.map(e => ShieldedExpr(convertExprReads(e))))
      case _ => convertReads(plan)
    }
    case m: MergeIntoTable => m.targetTable match {
      case GraftRel(rel, t) => translateMerge(m, rel, t)
      case _ => convertReads(plan)
    }
    // ALTER TABLE ... ADD CONSTRAINT name CHECK (...): Spark's native
    // plan is a validation scan + an exec tied to the DSv2 relation,
    // which the read conversion would orphan — route it to
    // Snapshots.setConstraint instead, which performs the same
    // existing-rows validation inside its own commit protocol.
    case a: AddCheckConstraint =>
      a.child.collectFirst {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          r.table.asInstanceOf[GraftTable]
      } match {
        case Some(t) =>
          requireCurrent(t, "ADD CONSTRAINT")
          val cc = a.checkConstraint
          val name = Option(cc.userProvidedName).getOrElse(
            "chk_" + Integer.toHexString(cc.condition.hashCode))
          GraftAddConstraintCommand(t.dir, t.identName, name, cc.condition)
        case None => convertReads(plan)
      }
    case other => convertReads(other)
  }

  private def requireCurrent(t: GraftTable, what: String): Unit =
    if (t.pinnedVersion.nonEmpty)
      throw new UnsupportedOperationException(
        s"$what cannot target '${t.identName}' pinned at VERSION AS OF " +
          s"${t.pinnedVersion.get} — DML applies to the current version")

  private def topLevelName(key: Expression, what: String): String =
    key match {
      case a: AttributeReference => a.name
      case other => throw new UnsupportedOperationException(
        s"$what on graft tables assigns top-level columns only, got " +
          s"'${other.sql}'")
    }

  // ---- reads --------------------------------------------------------

  /** Replace every graft DSv2 READ relation in `plan` (including under
    * subquery expressions) with the native Snapshots scan, leaving the
    * `table` slot of v2 write commands (`INSERT` targets) alone. */
  private def convertReads(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand =>
      w.withNewQuery(convertReads(w.query))
    // whole-table count(*)/count(col)/min/max: answered from manifest
    // stats when provably exact, falling through to the scan otherwise
    case agg: Aggregate =>
      metadataAggregate(agg).getOrElse {
        agg.mapChildren(convertReads).transformExpressionsDown {
          case se: SubqueryExpression => se.withNewPlan(convertReads(se.plan))
        }
      }
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => readPlan(r, t)
      case _ => r
    }
    // spark.readStream.table("graft.db.t"): route to the v1 snapshot
    // stream source (offsets-as-versions, file-granular admission
    // control, exactly-once) — DataStreamReader options (e.g.
    // maxFilesPerTrigger, startingVersion) pass through
    case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
        if s.table.isInstanceOf[GraftTable] =>
      val t = s.table.asInstanceOf[GraftTable]
      if (t.pinnedVersion.nonEmpty)
        throw new UnsupportedOperationException(
          s"cannot stream from '${t.identName}' pinned at VERSION AS OF " +
            s"${t.pinnedVersion.get} — a stream follows the current " +
            "version; use startingVersion to begin from history")
      import scala.jdk.CollectionConverters._
      org.apache.spark.sql.graft.GraftSparkBridge.streamingSourceRelation(
        session, "graft-snapshots",
        s.extraOptions.asScala.toMap + ("path" -> t.dir), s.output)
    case other =>
      other.mapChildren(convertReads).transformExpressionsDown {
        case se: SubqueryExpression => se.withNewPlan(convertReads(se.plan))
      }
  }

  /** The native scan for a relation, output attribute ids preserved:
    * an aliasing Project maps the fresh scan's columns (by
    * case-insensitive name) onto the relation's resolved attributes,
    * so every consumer above keeps its references. Filters and column
    * pruning push through the Project into the parquet scan. The
    * scan's `LogicalRelation`s carry the table's catalog identity —
    * `spark.catalog.refreshTable` (which Spark's v1 streaming-write
    * epilogue calls) walks the resolved plan and dereferences
    * `catalogTable` on every file relation it finds. */
  private def readPlan(r: DataSourceV2Relation, t: GraftTable): LogicalPlan = {
    val scan = t.readDF().queryExecution.analyzed.transform {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.catalogTable.isEmpty =>
        lr.copy(catalogTable = Some(t.v1Table))
    }
    val resolver = session.sessionState.conf.resolver
    Project(r.output.map { a =>
      val src = scan.output.find(o => resolver(o.name, a.name)).getOrElse(
        throw new IllegalStateException(
          s"column '${a.name}' of ${t.identName} is missing from the " +
            "snapshot scan — catalog and manifest disagree"))
      Alias(src, a.name)(exprId = a.exprId)
    }, scan)
  }

  /** Metadata-only and stats-decided aggregates — the 100 TB
    * `count(*)`.
    *
    * A whole-table `SELECT count(*) / count(col) / min(col) / max(col)
    * FROM graft.db.t` (no GROUP BY, no DISTINCT, no FILTER clause) is
    * answerable from the manifest's per-file stats lines without
    * opening a single data file:
    * [[graft.ops.Snapshots.aggregateFromManifest]] is exact-or-refuse
    * (every file must carry a stats line for every requested column;
    * strings refuse — truncated bounds are never provably attained;
    * deletion vectors refuse column stats but keep `count(*)` exact
    * via recorded per-vector position counts). With a WHERE, the same
    * aggregates take the stats-DECIDED path
    * ([[graft.ops.Snapshots.aggregateWhereFrame]]): provably-all-match
    * files contribute their stats (attained by matching rows) without
    * being opened, provably-none files contribute nothing, and only
    * the undecided boundary files scan — every broken proof demotes
    * its file into the scan set, so the answer stays exact for
    * arbitrary deterministic predicates. When either path refuses,
    * this rewrite falls through to the normal scan — correctness
    * never depends on the fast path. Opt out with
    * `spark.graft.sql.metadataAggregates=false`.
    *
    * The proof work (manifest read; for the filtered path two
    * pruneFiles passes ≈ 0.3-0.5 s driver-side) runs at ANALYSIS
    * time, so EXPLAIN and re-analysis pay it — deliberate: the plan's
    * SHAPE depends on the proofs (which files scan), exactly like
    * Delta's metadata-only query optimization, and the opt-out conf
    * exists for scan-cheap deployments where the constant outweighs
    * the saved I/O (measured crossover in BASELINE.md).
    *
    * The one-row result plan is spliced the same way [[readPlan]]
    * splices scans: aliases map its columns onto the Aggregate's
    * output attributes, exprIds preserved, so Sort/Project/subquery
    * consumers above are untouched. A type-mismatch guard falls
    * through rather than miscast. */
  private def metadataAggregate(agg: Aggregate): Option[LogicalPlan] = {
    if (!java.lang.Boolean.parseBoolean(session.conf
        .get("spark.graft.sql.metadataAggregates", "true"))) return None
    if (agg.groupingExpressions.nonEmpty) return None
    // derived-table aliases wrap the projection (SELECT agg FROM
    // (SELECT cols FROM t)): strip them, then accept the relation or a
    // pass-through projection of plain columns — names and ids carry
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case x => x
    }
    // the SQL catalog path (DSv2 GraftTable) and the DataFrame reader
    // path (v1 `format("graft-snapshots")` relation) unify HERE: both
    // name a table directory + optional pinned version, which is all
    // the manifest-stats plan needs — one rule serves both surfaces
    // (a DSv2 row-based scan for the reader path would forfeit the
    // native columnar parquet swap for every NON-aggregate read,
    // which is why the unification lives in the rule, not in a
    // SupportsPushDownAggregates scan)
    object StatsRel {
      def unapply(plan: LogicalPlan): Option[(String, Int)] = plan match {
        case GraftRel(_, t) => Some((t.dir, t.pinnedVersion.getOrElse(-1)))
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.relation.isInstanceOf[graft.streaming.SnapshotRelation] =>
          val sr = lr.relation.asInstanceOf[graft.streaming.SnapshotRelation]
          Some((sr.dir, sr.version))
        case SubqueryAlias(_, c) => unapply(c)
        case _ => None
      }
    }
    val (tDir, tVer, cond): (String, Int, Option[Expression]) =
      strip(agg.child) match {
        case StatsRel(d, v) => (d, v, None)
        case Project(ps, StatsRel(d, v))
            if ps.forall(_.isInstanceOf[AttributeReference]) => (d, v, None)
        // aggregates under a WHERE: the stats-DECIDED path — files the
        // manifest proves all-match or no-match are never opened; only
        // the undecided (boundary) files scan
        case LogicalFilter(c, StatsRel(d, v)) => (d, v, Some(c))
        case _ => return None
      }
    // a non-deterministic or subquery-bearing predicate cannot be
    // re-rooted/re-evaluated soundly — fall through to the scan
    if (cond.exists(c => !c.deterministic ||
      c.exists(_.isInstanceOf[SubqueryExpression]))) return None
    // map every aggregate to the manifest-frame column that answers it
    val specs: Seq[(Alias, String)] = agg.aggregateExpressions.map {
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(l: Literal)) if l.value != null => al -> "n_rows"
          case Count(Seq(a: AttributeReference)) => al -> s"n_${a.name}"
          case Min(a: AttributeReference) => al -> s"min_${a.name}"
          case Max(a: AttributeReference) => al -> s"max_${a.name}"
          case _ => return None
        }
      case _ => return None
    }
    val cols = specs.collect {
      case (_, c) if c != "n_rows" => c.substring(c.indexOf('_') + 1)
    }.distinct
    // a column literally named "rows" would make count(rows) collide
    // with the count(*) spelling n_rows — fall through to the scan
    if (cols.exists(_.equalsIgnoreCase("rows"))) return None
    val mdfOpt = cond match {
      case None =>
        Snapshots.aggregateFromManifest(session, tDir, cols, tVer)
      case Some(c) =>
        // re-root the resolved condition by NAME so it resolves against
        // the fresh native frame (same table, same logical schema)
        val pred = org.apache.spark.sql.graft.GraftSparkBridge.column(
          c.transform {
            case a: AttributeReference =>
              org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                .quoted(a.name)
          })
        Snapshots.aggregateWhereFrame(session, tDir, pred, cols, tVer)
    }
    mdfOpt.flatMap { mdf =>
      val meta = mdf.queryExecution.analyzed
      val outs = specs.map { case (al, c) =>
        meta.output.find(_.name == c).filter(_.dataType == al.dataType)
          .map(src => Alias(src, al.name)(exprId = al.exprId))
      }
      if (outs.exists(_.isEmpty)) None
      else Some(Project(outs.flatten, meta))
    }
  }

  // ---- merge --------------------------------------------------------

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** Convert graft READ relations inside an expression's subquery
    * plans — a `DELETE ... WHERE k IN (SELECT ... FROM graft.db.s)`
    * carries a whole plan inside its predicate. */
  private def convertExprReads(e: Expression): Expression =
    e.transform {
      case se: SubqueryExpression => se.withNewPlan(convertReads(se.plan))
    }

  /** Translate MERGE. ON must be a conjunction of target-column =
    * source-column equalities. Three routes, fastest first:
    *
    *   - lone unconditional `WHEN MATCHED THEN DELETE` → the
    *     one-commit CDC tombstone ([[GraftMergeDeleteCommand]]);
    *   - exactly one unconditional UPDATE + one unconditional INSERT
    *     with plain source-column values → the one-commit upsert
    *     ([[GraftMergeCommand]] over [[graft.ops.Snapshots.merge]]);
    *   - everything else with equi-ON — conditional guards
    *     (`WHEN MATCHED AND c`), mixed UPDATE+DELETE, partial action
    *     lists, expression values over both sides, `WHEN NOT MATCHED
    *     BY SOURCE UPDATE/DELETE` (which force the classification
    *     join full-outer and forfeit point-merge pruning — a BY
    *     SOURCE clause inspects every target row by definition) — →
    *     the classified path ([[GraftMergeActionsCommand]]): one
    *     classification join, then ONE atomic commit via
    *     [[graft.ops.Snapshots.mergeMixed]].
    *
    * Still refused loudly: WITH SCHEMA EVOLUTION, subqueries anywhere
    * in the statement's conditions. */
  private def translateMerge(m: MergeIntoTable, rel: DataSourceV2Relation,
      t: GraftTable): LogicalPlan = {
    requireCurrent(t, "MERGE INTO")
    def refuse(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO '${t.identName}': $why (graft SQL MERGE supports " +
          "ON conjunctive column equalities with conditional or " +
          "unconditional WHEN MATCHED UPDATE/DELETE, WHEN NOT " +
          "MATCHED INSERT, and WHEN NOT MATCHED BY SOURCE " +
          "UPDATE/DELETE actions)")
    // WITH SCHEMA EVOLUTION: Spark's ResolveMergeIntoSchemaEvolution
    // already ran (GraftTable advertises AUTOMATIC_SCHEMA_EVOLUTION),
    // committing new-source-column adds through GraftCatalog.alterTable
    // (metadata-only; non-AddColumn changes throw there/in Spark) and
    // reloading the target relation widened. If evolution is still
    // pending here, the rule could not apply — refuse rather than
    // silently drop columns.
    if (m.needSchemaEvolution)
      refuse("WITH SCHEMA EVOLUTION could not be applied to this target")
    if (m.mergeCondition.exists(_.isInstanceOf[SubqueryExpression]))
      refuse("ON with a subquery is not supported")
    val tAttrs = AttributeSet(rel.output)
    val sAttrs = AttributeSet(m.sourceTable.output)
    val keyPairs = splitConjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tAttrs.contains(a) && sAttrs.contains(b) => a.name -> b.name
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tAttrs.contains(a) && sAttrs.contains(b) => a.name -> b.name
      case other => refuse(
        s"ON clause term '${other.sql}' is not a target = source " +
          "column equality")
    }
    val resolver = session.sessionState.conf.resolver
    val targetCols = rel.output.map(_.name)
    val keyByTarget = keyPairs.toMap

    // a BY SOURCE clause always takes the classified path (it needs
    // the full-outer classification join)
    if (m.notMatchedBySourceActions.nonEmpty)
      return translateMergeActions(m, rel, t, keyPairs, refuse)

    // WHEN MATCHED THEN DELETE (alone): the CDC tombstone shape —
    // matched rows go, nothing inserts
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(d: DeleteAction), Seq()) if d.condition.isEmpty =>
        return GraftMergeDeleteCommand(t.dir, t.identName,
          convertReads(m.sourceTable), keyPairs)
      case _ =>
    }

    // an assignment list as target-col -> source-col, refusing
    // anything but plain source-column values
    def mapping(assigns: Seq[Assignment], act: String): Map[String, String] =
      assigns.map { as =>
        val tName = topLevelName(as.key, s"MERGE $act")
        val sName = as.value match {
          case a: AttributeReference if sAttrs.contains(a) => a.name
          case other => refuse(
            s"$act assigns '${tName}' from '${other.sql}' — only plain " +
              "source columns are supported")
        }
        tName -> sName
      }.toMap

    def starMapping(act: String): Map[String, String] =
      targetCols.map { c =>
        m.sourceTable.output.find(o => resolver(o.name, c)) match {
          case Some(o) => c -> o.name
          case None => refuse(s"$act SET * needs source column '$c'")
        }
      }.toMap

    // the ONE-COMMIT fast path: exactly one unconditional UPDATE +
    // one unconditional INSERT, both with plain source-column values
    // → Snapshots.merge directly. Everything else (conditional
    // guards, mixed UPDATE+DELETE, partial action lists, expressions
    // over both sides) takes the general classified path below.
    val simple = (m.matchedActions, m.notMatchedActions) match {
      case (Seq(u: UpdateStarAction), Seq(i: InsertStarAction))
          if u.condition.isEmpty && i.condition.isEmpty =>
        Some((starMapping("WHEN MATCHED"), starMapping("WHEN NOT MATCHED")))
      case (Seq(u: UpdateAction), Seq(i: InsertStarAction))
          if u.condition.isEmpty && i.condition.isEmpty &&
            u.assignments.forall(_.value.isInstanceOf[AttributeReference]) =>
        Some((mapping(u.assignments, "MATCHED UPDATE"),
          starMapping("WHEN NOT MATCHED")))
      case (Seq(u: UpdateStarAction), Seq(i: InsertAction))
          if u.condition.isEmpty && i.condition.isEmpty &&
            i.assignments.forall(_.value.isInstanceOf[AttributeReference]) =>
        Some((starMapping("WHEN MATCHED"),
          mapping(i.assignments, "NOT MATCHED INSERT")))
      case (Seq(u: UpdateAction), Seq(i: InsertAction))
          if u.condition.isEmpty && i.condition.isEmpty &&
            (u.assignments ++ i.assignments)
              .forall(_.value.isInstanceOf[AttributeReference]) =>
        Some((mapping(u.assignments, "MATCHED UPDATE"),
          mapping(i.assignments, "NOT MATCHED INSERT")))
      case _ => None
    }
    simple match {
      case Some((updMap, insMap)) =>
        // the full target-shape projection: keys come from ON, the
        // rest from the (agreeing) UPDATE and INSERT mappings
        val colMap = targetCols.map { c =>
          val fromKey = keyByTarget.collectFirst {
            case (tc, sc) if resolver(tc, c) => sc
          }
          val fromUpd = updMap.collectFirst {
            case (tc, sc) if resolver(tc, c) => sc
          }
          val fromIns = insMap.collectFirst {
            case (tc, sc) if resolver(tc, c) => sc
          }
          (fromUpd, fromIns) match {
            case (Some(u), Some(i)) if u != i =>
              refuse(s"UPDATE and INSERT disagree on '$c' ($u vs $i) — " +
                "Snapshots.merge writes one row shape")
            case _ =>
          }
          val src = fromKey.orElse(fromUpd).orElse(fromIns).getOrElse(
            refuse(s"no source mapping for target column '$c'"))
          c -> src
        }
        GraftMergeCommand(t.dir, t.identName, convertReads(m.sourceTable),
          colMap, keyPairs.map(_._1))
      case None =>
        translateMergeActions(m, rel, t, keyPairs, refuse)
    }
  }

  /** The general MERGE: conditional / mixed / partial action lists,
    * expressions over both sides — translated to
    * [[GraftMergeActionsCommand]]'s classified two-verb composition.
    * Conditions and assignment values are rerooted by name: target
    * references become `__t_<name>` (the classification join's
    * target-side columns), source references stay bare. Subqueries
    * inside MERGE actions refuse (materialize them into the source). */
  private def translateMergeActions(m: MergeIntoTable,
      rel: DataSourceV2Relation, t: GraftTable,
      keyPairs: Seq[(String, String)], refuse: String => Nothing)
      : LogicalPlan = {
    val tAttrs = AttributeSet(rel.output)
    val sAttrs = AttributeSet(m.sourceTable.output)
    val resolver = session.sessionState.conf.resolver
    val targetCols = rel.output.map(_.name)
    val keyTargets = keyPairs.map(_._1).toSet

    def reroot(e: Expression, ctx: String, allowTarget: Boolean,
        allowSource: Boolean = true): ShieldedExpr = {
      if (e.exists(_.isInstanceOf[SubqueryExpression]))
        refuse(s"$ctx contains a subquery — materialize it into the " +
          "MERGE source")
      ShieldedExpr(e.transform {
        // the analyzer resolves each merge clause against its LEGAL
        // scope only (a BY SOURCE clause: the target alone) and
        // leaves out-of-scope references unresolved rather than
        // failing the statement — were it let through, it would
        // resolve BY NAME at run time against the classification
        // join and silently evaluate over the absent side's NULLs
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          refuse(s"$ctx references '${u.name}', which is not in this " +
            "clause's scope" + (if (!allowSource)
              " — a NOT MATCHED BY SOURCE clause sees only the target"
            else if (!allowTarget)
              " — a NOT MATCHED clause sees only the source"
            else ""))
        case a: AttributeReference if tAttrs.contains(a) =>
          if (!allowTarget)
            refuse(s"$ctx references target column '${a.name}' — a NOT " +
              "MATCHED clause sees only the source")
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted("__t_" + a.name)
        case a: AttributeReference if sAttrs.contains(a) =>
          if (!allowSource)
            refuse(s"$ctx references source column '${a.name}' — a NOT " +
              "MATCHED BY SOURCE clause sees only the target")
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted(a.name)
      })
    }

    def srcOf(c: String, ctx: String): ShieldedExpr =
      m.sourceTable.output.find(o => resolver(o.name, c))
        .map(o => ShieldedExpr(org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute.quoted(o.name)))
        .getOrElse(refuse(s"$ctx SET * needs source column '$c'"))

    def updAssigns(assigns: Seq[Assignment], ctx: String,
        allowSource: Boolean = true): Seq[(String, ShieldedExpr)] =
      assigns.flatMap { as =>
        val tName = topLevelName(as.key, s"MERGE $ctx")
        keyTargets.find(resolver(_, tName)) match {
          case Some(kt) =>
            // `UPDATE SET *` analyzer-expands to explicit assignments
            // that include the ON key from its own source column (or,
            // BY SOURCE, from itself) — an identity no-op; drop it.
            // Any OTHER value for a key refuses: the key addresses
            // the row and cannot be reassigned.
            val identity = as.value match {
              case a: AttributeReference if sAttrs.contains(a) =>
                keyPairs.exists { case (tc, sc) =>
                  resolver(tc, kt) && resolver(sc, a.name) }
              case a: AttributeReference if tAttrs.contains(a) =>
                resolver(a.name, kt)
              case _ => false
            }
            if (!identity)
              refuse(s"$ctx assigns ON key column '$tName' — a merge " +
                "key identifies the row and cannot be reassigned")
            None
          case None =>
            Some(tName -> reroot(as.value, ctx, allowTarget = true,
              allowSource))
        }
      }

    val matched = m.matchedActions.map {
      case u: UpdateStarAction =>
        (u.condition.map(reroot(_, "WHEN MATCHED AND", allowTarget = true)),
          GraftMergeUpd(targetCols.filterNot(keyTargets.contains)
            .map(c => c -> srcOf(c, "WHEN MATCHED UPDATE"))))
      case u: UpdateAction =>
        (u.condition.map(reroot(_, "WHEN MATCHED AND", allowTarget = true)),
          GraftMergeUpd(updAssigns(u.assignments, "MATCHED UPDATE")))
      case d: DeleteAction =>
        (d.condition.map(reroot(_, "WHEN MATCHED AND", allowTarget = true)),
          GraftMergeDel)
      case other: MergeAction =>
        refuse(s"unsupported WHEN MATCHED action ${other.getClass.getSimpleName}")
    }
    val notMatched = m.notMatchedActions.map {
      case i: InsertStarAction =>
        (i.condition.map(reroot(_, "WHEN NOT MATCHED AND",
          allowTarget = false)),
          GraftMergeIns(targetCols.map(c =>
            c -> srcOf(c, "WHEN NOT MATCHED INSERT"))))
      case i: InsertAction =>
        (i.condition.map(reroot(_, "WHEN NOT MATCHED AND",
          allowTarget = false)),
          GraftMergeIns(i.assignments.map { as =>
            topLevelName(as.key, "MERGE INSERT") ->
              reroot(as.value, "NOT MATCHED INSERT", allowTarget = false)
          }))
      case other: MergeAction =>
        refuse(s"unsupported WHEN NOT MATCHED action ${other.getClass.getSimpleName}")
    }
    // every NOT MATCHED INSERT must set all ON keys — a NULL-keyed
    // insert can never be matched by a later merge and is almost
    // always a mistranslated statement
    notMatched.foreach { case (_, ins) =>
      keyPairs.foreach { case (tc, _) =>
        if (!ins.assigns.exists { case (n, _) => resolver(n, tc) })
          refuse(s"WHEN NOT MATCHED INSERT must set ON key column '$tc'")
      }
    }
    // WHEN NOT MATCHED BY SOURCE: target-only rows — guards and
    // assignment values may reference ONLY target columns (the
    // source side does not exist for these rows)
    val bySource = m.notMatchedBySourceActions.map {
      case u: UpdateAction =>
        (u.condition.map(reroot(_, "WHEN NOT MATCHED BY SOURCE AND",
          allowTarget = true, allowSource = false)),
          GraftMergeUpd(updAssigns(u.assignments,
            "NOT MATCHED BY SOURCE UPDATE", allowSource = false)))
      case d: DeleteAction =>
        (d.condition.map(reroot(_, "WHEN NOT MATCHED BY SOURCE AND",
          allowTarget = true, allowSource = false)), GraftMergeDel)
      case other: MergeAction =>
        refuse("unsupported WHEN NOT MATCHED BY SOURCE action " +
          other.getClass.getSimpleName)
    }
    GraftMergeActionsCommand(t.dir, t.identName,
      convertReads(m.sourceTable), keyPairs, matched, notMatched, bySource)
  }
}
