package graft.sql

import java.util.Properties

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, FunctionRegistry, NoSuchTableException, NoSuchViewException, UnresolvedFunction, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, AnalyzeColumn, AnalyzeTable, CreateView, DropView, Filter, LeafNode, LogicalPlan, Project, ShowViews, SubqueryAlias, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, StringType, StructType}

/** Persistent (catalog-stored) views for [[GraftCatalog]] — shared
  * semantics across sessions, where temp views cover one session only:
  *
  * {{{
  * CREATE VIEW graft.db.active AS SELECT * FROM graft.db.t WHERE live;
  * SELECT count(*) FROM graft.db.active;   -- any later session
  * SHOW VIEWS IN graft.db; DROP VIEW graft.db.active;
  * }}}
  *
  * Spark 4's DSv2 `ViewCatalog` interface defines the storage contract
  * but the built-in SQL layer does not route view statements to it —
  * `ResolveSessionCatalog` throws MISSING_CATALOG_ABILITY for any
  * non-session catalog before custom resolution rules could run. So,
  * like the other lakehouse formats, the SQL surface is wired through
  * the session extensions in two pieces:
  *
  *   - [[GraftViewAwareParser]] (injectParser) re-targets parsed
  *     `CREATE [OR REPLACE] VIEW` / `DROP VIEW` / `SHOW VIEWS` plans
  *     whose identifier addresses a graft catalog into graft statement
  *     nodes BEFORE the analyzer can reject them;
  *   - [[GraftViewResolution]] (injectResolutionRule) expands reads of
  *     catalog views into their parsed definition (CTE-substituted,
  *     with unqualified table references fixed to the CREATE-time
  *     catalog and namespace, so the view means the same thing from
  *     any session context) and converts the statement nodes into
  *     runnable commands once their parts resolve.
  *
  * Storage: GENERATIONED properties documents per view under the
  * warehouse (`warehouse/ns/name/_view` = generation 0, replacements
  * `_view.<N>`), each published through the SAME per-scheme commit CAS
  * as table manifests and then immutable — a racing CREATE of one view
  * name loses loudly instead of clobbering, `CREATE OR REPLACE` /
  * `ALTER VIEW` publish generation N+1 and prune only once it is
  * durable (so a crash mid-replace never loses the view, readers never
  * observe a document-less window, and concurrent ALTERs CAS against
  * the generation they loaded — the loser fails loudly instead of
  * silently dropping the winner's change).
  *
  * Deliberate limits: a view definition must not reference TEMP views
  * (refused at CREATE and ALTER — a shared definition over
  * session-local state would dangle for every other session);
  * `ALTER VIEW ... AS` swaps the definition (keeping properties,
  * resetting column aliases) and refuses a definition that would
  * close a reference cycle AT DDL TIME ([[findCycle]] — previously a
  * racing-REPLACE cycle only failed at read, at the analyzer's
  * iteration cap); SET/UNSET TBLPROPERTIES on views goes through the
  * catalog API. Streaming reads: a PASS-THROUGH view (its definition
  * is a bare `SELECT * FROM one_table`) legally streams — it resolves
  * to the underlying table's stream under the view's CREATE-time
  * context, aliases applied; any other shape refuses with a named
  * error (an arbitrary query has no change feed). */
object GraftViews {

  /** The legacy single-document name (generation 0). Replacements
    * publish `_view.<N>` siblings — see [[viewDocs]]. */
  val ViewFile = "_view"

  /** All stored view-document generations under `dir`, ascending:
    * the legacy `_view` file reads as generation 0, replacements are
    * `_view.<N>`. The CURRENT definition is the highest generation —
    * REPLACE/ALTER publish generation N+1 through the commit CAS and
    * only then prune generations <= N-1, so the old definition
    * survives any crash or publish failure until the new one is
    * durable (and a reader that listed just before a publish still
    * opens its generation successfully). */
  def viewDocs(fs: FileSystem, dir: HPath): Seq[(Int, HPath)] = {
    val sts =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException => return Nil }
    sts.iterator.filter(_.isFile).flatMap { st =>
      val n = st.getPath.getName
      if (n == ViewFile) Some((0, st.getPath))
      else if (n.startsWith(ViewFile + ".") &&
          n.substring(ViewFile.length + 1).forall(_.isDigit) &&
          n.length > ViewFile.length + 1)
        Some((n.substring(ViewFile.length + 1).toInt, st.getPath))
      else None
    }.toSeq.sortBy(_._1)
  }

  /** The current (highest-generation) view document, if any. */
  def currentDoc(fs: FileSystem, dir: HPath): Option[(Int, HPath)] =
    viewDocs(fs, dir).lastOption

  /** Best-effort prune of superseded generations strictly below
    * `keepFrom` — called only AFTER the replacement generation is
    * durable; a failure here leaves extra (ignored) history, never a
    * broken view. */
  def pruneDocs(fs: FileSystem, dir: HPath, keepFrom: Int): Unit =
    try viewDocs(fs, dir).takeWhile(_._1 < keepFrom)
      .foreach { case (_, p) => fs.delete(p, false) }
    catch { case NonFatal(_) => }

  /** (catalog, identifier) when `parts` addresses a [[GraftCatalog]]
    * under the session's resolution rules (explicit catalog prefix, or
    * the current catalog for shorter names) AND no temp view shadows
    * it — temp views win, Spark's standard precedence. */
  def resolveView(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    if (session.sessionState.catalog.isTempView(parts)) return None
    val cm = session.sessionState.catalogManager
    def current: Option[GraftCatalog] = cm.currentCatalog match {
      case g: GraftCatalog => Some(g)
      case _ => None
    }
    parts match {
      case Seq(one) =>
        current.map(g => (g, Identifier.of(cm.currentNamespace, one)))
      case head +: rest =>
        // the current-catalog fallback applies ONLY when the head is
        // not a catalog at all (it is then a namespace level) — a head
        // that names a DIFFERENT registered catalog must never be
        // hijacked into the graft warehouse
        (try Some(cm.catalog(head))
        catch { case NonFatal(_) => None }) match {
          case Some(g: GraftCatalog) =>
            Some((g, Identifier.of(rest.init.toArray, rest.last)))
          case Some(_) => None
          case None => current.map(g =>
            (g, Identifier.of(parts.init.toArray, parts.last)))
        }
    }
  }

  /** (catalog, namespace) when `parts` names a namespace of a
    * [[GraftCatalog]] (empty parts = the current namespace of a graft
    * current catalog). */
  def resolveNamespace(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Seq[String])] = {
    val cm = session.sessionState.catalogManager
    def current: Option[GraftCatalog] = cm.currentCatalog match {
      case g: GraftCatalog => Some(g)
      case _ => None
    }
    parts match {
      case Seq() => current.map(g => (g, cm.currentNamespace.toSeq))
      case head +: rest =>
        // same non-hijack rule as [[resolveView]]
        (try Some(cm.catalog(head))
        catch { case NonFatal(_) => None }) match {
          case Some(g: GraftCatalog) => Some((g, rest))
          case Some(_) => None
          case None => current.map(g => (g, parts))
        }
    }
  }

  /** Qualify a stored definition's table reference with the view's
    * CREATE-time catalog/namespace — the same rule the expansion
    * applies (names of <= 2 parts mean catalog objects in the capture
    * context; CREATE refused temp-view references). */
  private def qualify(parts: Seq[String], cat: String,
      ns: Seq[String]): Seq[String] = parts match {
    case Seq(one) => (cat +: ns) :+ one
    case two if two.length == 2 => cat +: two
    case full => full
  }

  /** The graft-view references of a definition, resolved under its
    * capture context — subqueries and CTEs included. Only names that
    * CURRENTLY resolve to a stored graft view count (a reference to a
    * table or an undefined name cannot extend a cycle). */
  private def referencedViews(session: SparkSession, sql: String,
      cat: String, ns: Seq[String]): Seq[(GraftCatalog, Identifier)] = {
    val parsed = CTESubstitution(
      session.sessionState.sqlParser.parsePlan(sql))
    val out = scala.collection.mutable.ArrayBuffer[(GraftCatalog, Identifier)]()
    parsed.foreachWithSubqueries {
      case u: UnresolvedRelation =>
        resolveView(session, qualify(u.multipartIdentifier, cat, ns))
          .foreach { case (g, id) => if (g.viewExists(id)) out += ((g, id)) }
      case _ =>
    }
    out.distinct.toSeq
  }

  /** Would storing `sql` as the definition of `target` close a view
    * reference cycle? Walks the stored definitions breadth-bounded
    * (each view loaded once, depth capped) and returns the offending
    * reference path — the DDL-time refusal that replaces "fails at the
    * analyzer's iteration cap on the first read". Cost is O(views on
    * the reference path): driver-side metadata reads only, the same
    * documents the first expansion would load anyway. */
  def findCycle(session: SparkSession, g0: GraftCatalog,
      target: Identifier, sql: String, cat: String,
      ns: Seq[String]): Option[Seq[String]] = {
    def keyOf(g: GraftCatalog, id: Identifier): String =
      ((g.name +: id.namespace.toSeq) :+ id.name).mkString(".")
    val targetKey = keyOf(g0, target)
    val seen = scala.collection.mutable.Set[String]()
    def dfs(g: GraftCatalog, id: Identifier,
        path: Vector[String]): Option[Seq[String]] = {
      val key = keyOf(g, id)
      if (key == targetKey) return Some(path :+ key)
      if (!seen.add(key) || path.length > 32) return None
      val v =
        try g.loadView(id)
        catch { case _: NoSuchViewException => return None }
      referencedViews(session, v.query, v.currentCatalog,
        v.currentNamespace.toSeq).view
        .flatMap(x => dfs(x._1, x._2, path :+ key)).headOption
    }
    referencedViews(session, sql, cat, ns).view
      .flatMap(x => dfs(x._1, x._2, Vector(targetKey))).headOption
  }

  /** Function names that are deterministic-looking at parse time but
    * must not silently re-evaluate per micro-batch inside a streamed
    * view definition — evaluated, they would make the streamed rows
    * differ from the batch view's. Fail-closed complement to the
    * registry checks in [[streamingComposition]]. */
  private val NonStreamableFns = Set(
    "rand", "randn", "random", "uuid", "shuffle",
    "monotonically_increasing_id", "current_timestamp", "now",
    "localtimestamp", "current_date", "curdate", "input_file_name",
    "spark_partition_id")

  /** Is every function reference in `e` a BUILT-IN, deterministic,
    * non-aggregate, non-window scalar? Unknown names, registered UDFs,
    * subqueries and window specs all fail CLOSED — a streamed view must
    * compute exactly what the batch view computes, row by row. */
  private def streamableExpr(e: Expression): Boolean = {
    var ok = true
    e.foreach {
      case f: UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        if (f.nameParts.lengthCompare(1) != 0 || NonStreamableFns(name) ||
            f.isDistinct || f.filter.nonEmpty || f.orderingWithinGroup.nonEmpty)
          ok = false
        else FunctionRegistry.builtin
          .lookupFunction(FunctionIdentifier(name)) match {
          case None => ok = false // UDF or unknown: fail closed
          case Some(info) =>
            if (info.getGroup == "agg_funcs" ||
                info.getGroup == "window_funcs") ok = false
            else {
              // the registry group is empty for some builtins — the
              // expression CLASS is the authority on aggregate-ness
              val agg = try {
                val cls = Class.forName(info.getClassName)
                classOf[org.apache.spark.sql.catalyst.expressions
                  .aggregate.AggregateFunction].isAssignableFrom(cls) ||
                classOf[org.apache.spark.sql.catalyst.expressions
                  .WindowFunction].isAssignableFrom(cls)
              } catch { case NonFatal(_) => true } // unloadable: closed
              if (agg) ok = false
            }
        }
      case _: org.apache.spark.sql.catalyst.expressions
          .WindowExpression => ok = false
      case _: org.apache.spark.sql.catalyst.expressions
          .UnresolvedWindowExpression => ok = false
      case _: PlanExpression[_] => ok = false // subqueries are stateful
      case _ =>
    }
    ok
  }

  /** The STREAMING logical plan a view chain legally resolves to, when
    * every definition on it is a STATELESS single-table transform —
    * projections and filters of deterministic built-in scalars over
    * exactly one base relation (nested such views included). Such a
    * view adds nothing a change feed cannot carry row by row, so the
    * stream is the view's own transforms composed over the underlying
    * table's stream: same rows as re-running the batch view per tick,
    * delivered incrementally. Aggregates, joins, window functions,
    * subqueries, DISTINCT/ORDER/LIMIT, non-deterministic or UDF calls
    * all return None and the streaming refusal stands — a streaming
    * aggregate under the view's name would silently CHANGE semantics
    * (incremental state vs batch recompute), which a reader must opt
    * into explicitly on the base table, not inherit from a name.
    *
    * The READER's options (`maxFilesPerTrigger`, `startingVersion`,
    * `readChangeFeed`, ...) travel to the base relation — they
    * configure the SOURCE, and the view name is just an address for
    * it. `readChangeFeed=true` additionally restricts the chain to
    * PURE pass-through WITHOUT declared column aliases (star
    * projections only): change rows carry `_change_type` /
    * `_commit_version` metadata a projection would silently drop, a
    * filter would ambiguously apply to pre- vs post-images, and an
    * alias list covers only the data columns (arity mismatch) —
    * refusing beats delivering a feed that cannot be applied.
    *
    * Resolution happens when the STREAM STARTS (Spark analyzes a
    * streaming query once): an ALTER VIEW while a stream runs does
    * not recompose the running query — the standard view-vs-stream
    * lifecycle, same as every lakehouse engine. */
  def streamingComposition(session: SparkSession, g0: GraftCatalog,
      v0: View, readerOptions: org.apache.spark.sql.util
        .CaseInsensitiveStringMap): Option[LogicalPlan] = {
    val feedMode = Option(readerOptions.get("readChangeFeed"))
      .exists(_.equalsIgnoreCase("true"))
    def compose(v: View, hops: Int): Option[LogicalPlan] = {
      if (hops > 8) return None
      val parsed = CTESubstitution(
        session.sessionState.sqlParser.parsePlan(v.query))
      // CREATE-time qualification, same discipline as batch expansion
      val qualified = parsed.transformDownWithSubqueries {
        case u: UnresolvedRelation if u.multipartIdentifier.length <= 2 &&
            !u.isStreaming =>
          val full = u.multipartIdentifier match {
            case Seq(one) =>
              (v.currentCatalog +: v.currentNamespace.toSeq) :+ one
            case two => v.currentCatalog +: two
          }
          u.copy(multipartIdentifier = full.toSeq)
      }
      def starOnly(pr: Project): Boolean = pr.projectList.forall {
        case s: org.apache.spark.sql.catalyst.analysis.UnresolvedStar =>
          s.target.isEmpty
        case _ => false
      }
      def rebuild(p: LogicalPlan): Option[LogicalPlan] = p match {
        case u: UnresolvedRelation if !u.isStreaming =>
          resolveView(session, u.multipartIdentifier) match {
            case Some((g, id)) if g.viewExists(id) =>
              compose(g.loadView(id), hops + 1) // nested stateless view
            case _ => // the base table: the reader's options attach here
              Some(u.copy(isStreaming = true, options = readerOptions))
          }
        case pr: Project if feedMode =>
          if (starOnly(pr)) rebuild(pr.child).map(c => pr.copy(child = c))
          else None // a projection would drop the feed's metadata cols
        case pr: Project if pr.projectList.forall(streamableExpr) =>
          rebuild(pr.child).map(c => pr.copy(child = c))
        case f: Filter if !feedMode && streamableExpr(f.condition) =>
          rebuild(f.child).map(c => f.copy(child = c))
        case a: SubqueryAlias => rebuild(a.child).map(c => a.copy(child = c))
        case _ => None // joins/aggregates/sorts/limits/set-ops: refuse
      }
      rebuild(qualified).flatMap { r =>
        if (v.columnAliases == null || v.columnAliases.isEmpty) Some(r)
        // declared aliases cover the view's DATA columns only — under
        // readChangeFeed the stream adds metadata columns the alias
        // list cannot cover (an arity mismatch at analysis), so the
        // named refusal fires instead of a confusing count error
        else if (feedMode) None
        else Some(UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, r))
      }
    }
    compose(v0, 0)
  }

  /** Render a `ViewInfo` as the stored properties document. Multi-
    * value fields URL-encode their elements and join on tab; a NULL
    * comment encodes as the empty element (comments cannot be the
    * empty string through SQL, so the sentinel is unambiguous). */
  def render(info: ViewInfo): Array[Byte] = {
    val p = new Properties()
    def joinEnc(xs: Seq[String]): String =
      xs.map(x => java.net.URLEncoder.encode(
        Option(x).getOrElse(""), "UTF-8")).mkString("\t")
    p.setProperty("sql", info.sql)
    p.setProperty("catalog", info.currentCatalog)
    p.setProperty("namespace", joinEnc(info.currentNamespace.toSeq))
    p.setProperty("schema", info.schema.json)
    p.setProperty("queryColumnNames",
      joinEnc(Option(info.queryColumnNames).map(_.toSeq).getOrElse(Nil)))
    p.setProperty("columnAliases",
      joinEnc(Option(info.columnAliases).map(_.toSeq).getOrElse(Nil)))
    p.setProperty("columnComments",
      joinEnc(Option(info.columnComments).map(_.toSeq).getOrElse(Nil)))
    Option(info.properties).foreach(_.asScala.foreach { case (k, v) =>
      p.setProperty(s"p.$k", v) })
    val bos = new java.io.ByteArrayOutputStream()
    p.store(bos, null)
    bos.toByteArray
  }

  def load(fs: FileSystem, viewFile: HPath, viewName: String): View = {
    val in = fs.open(viewFile)
    val p = new Properties()
    try p.load(in) finally in.close()
    def splitDec(k: String): Array[String] = {
      val raw = Option(p.getProperty(k)).getOrElse("")
      if (raw.isEmpty) Array.empty
      else raw.split('\t').map(java.net.URLDecoder.decode(_, "UTF-8"))
    }
    val props = p.stringPropertyNames.asScala.toSeq
      .filter(_.startsWith("p."))
      .map(k => k.stripPrefix("p.") -> p.getProperty(k)).toMap
    new View {
      override val name: String = viewName
      override val query: String = p.getProperty("sql")
      override val currentCatalog: String = p.getProperty("catalog")
      override val currentNamespace: Array[String] = splitDec("namespace")
      override val schema: StructType =
        org.apache.spark.sql.types.DataType.fromJson(
          p.getProperty("schema")).asInstanceOf[StructType]
      override val queryColumnNames: Array[String] =
        splitDec("queryColumnNames")
      override val columnAliases: Array[String] = splitDec("columnAliases")
      override val columnComments: Array[String] =
        splitDec("columnComments").map(c => if (c.isEmpty) null else c)
      override val properties: java.util.Map[String, String] = props.asJava
    }
  }
}

// ---- statement nodes (parser output, pre-resolution) -----------------

/** Parsed `CREATE [OR REPLACE] VIEW` aimed at a graft catalog; the
  * query stays a child so the analyzer resolves it before the
  * conversion to the runnable command captures its schema. */
final case class CreateGraftViewStatement(nameParts: Seq[String],
    userCols: Seq[(String, Option[String])], comment: Option[String],
    props: Map[String, String], originalText: Option[String],
    query: LogicalPlan, allowExisting: Boolean, replace: Boolean)
    extends UnaryNode {
  override def child: LogicalPlan = query
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(
      newChild: LogicalPlan): CreateGraftViewStatement =
    copy(query = newChild)
}

final case class DropGraftViewStatement(nameParts: Seq[String],
    ifExists: Boolean) extends LeafNode {
  override def output: Seq[Attribute] = Nil
}

final case class ShowGraftViewsStatement(nsParts: Seq[String],
    pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafNode

/** Parsed `ALTER VIEW ... AS <query>` aimed at a graft catalog:
  * the definition swap that keeps the view's properties. */
final case class AlterGraftViewAsStatement(nameParts: Seq[String],
    originalText: String, query: LogicalPlan) extends UnaryNode {
  override def child: LogicalPlan = query
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(
      newChild: LogicalPlan): AlterGraftViewAsStatement =
    copy(query = newChild)
}

/** Parsed `SHOW CREATE TABLE` whose identifier names a graft VIEW —
  * SHOW CREATE parity between the two object kinds (tables answer
  * through Spark's own v2 exec against [[GraftTable]]). */
final case class ShowCreateGraftViewStatement(nameParts: Seq[String],
    override val output: Seq[Attribute]) extends LeafNode

/** Parsed `DESCRIBE [EXTENDED]` whose identifier names a graft VIEW. */
final case class DescribeGraftViewStatement(nameParts: Seq[String],
    isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafNode

/** Parsed `SHOW TBLPROPERTIES` whose identifier names a graft VIEW. */
final case class ShowGraftViewPropsStatement(nameParts: Seq[String],
    propertyKey: Option[String],
    override val output: Seq[Attribute]) extends LeafNode

/** Parsed `ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ... |
  * FOR ALL COLUMNS]` aimed at a graft catalog (Spark's own analyze
  * commands are session-catalog only — same routing problem as the
  * view DDL). */
final case class AnalyzeGraftTableStatement(nameParts: Seq[String],
    columns: Seq[String], allColumns: Boolean) extends LeafNode {
  override def output: Seq[Attribute] = Nil
}

/** The parser hook (see [[GraftViews]]): delegates everything, then
  * re-targets the three view statements when their identifier
  * addresses a graft catalog — BEFORE `ResolveSessionCatalog` gets a
  * chance to reject them as a missing catalog ability. Statements
  * over session-catalog or temp-view names pass through untouched. */
final class GraftViewAwareParser(session: () => SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  private def retarget(plan: LogicalPlan): LogicalPlan = {
    // cheap top-node inspection per statement; anything that throws
    // here (catalog plugins not initialized yet) passes through to
    // Spark's own handling
    try retarget0(plan) catch { case NonFatal(_) => plan }
  }

  private def retarget0(plan: LogicalPlan): LogicalPlan = plan match {
    case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, orig, query, allowExisting, replace, _)
        if GraftViews.resolveView(session(), parts).isDefined =>
      CreateGraftViewStatement(parts, cols, comment, props, orig, query,
        allowExisting, replace)
    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists)
        if GraftViews.resolveView(session(), parts).isDefined =>
      DropGraftViewStatement(parts, ifExists)
    case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output)
        if GraftViews.resolveNamespace(session(), parts).isDefined =>
      ShowGraftViewsStatement(parts, pattern, output)
    case a @ AlterViewAs(UnresolvedView(parts, _, _, _), orig, query)
        if GraftViews.resolveView(session(), parts).isDefined =>
      AlterGraftViewAsStatement(parts, orig, query)
    // SHOW CREATE TABLE / DESCRIBE / SHOW TBLPROPERTIES over a graft
    // VIEW identifier: the existence probe is exact (one metadata read
    // on rare statements); a graft TABLE identifier passes through to
    // Spark's own v2 execs untouched
    case sc @ org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable(
        UnresolvedTableOrView(parts, _, _), false, output)
        if GraftViews.resolveView(session(), parts)
          .exists { case (g, id) => g.viewExists(id) } =>
      ShowCreateGraftViewStatement(parts, output)
    case d @ org.apache.spark.sql.catalyst.plans.logical.DescribeRelation(
        UnresolvedTableOrView(parts, _, _), partitionSpec, isExtended,
        output)
        if partitionSpec.isEmpty &&
          GraftViews.resolveView(session(), parts)
            .exists { case (g, id) => g.viewExists(id) } =>
      DescribeGraftViewStatement(parts, isExtended, output)
    case sp @ org.apache.spark.sql.catalyst.plans.logical
        .ShowTableProperties(UnresolvedTableOrView(parts, _, _), key,
          output)
        if GraftViews.resolveView(session(), parts)
          .exists { case (g, id) => g.viewExists(id) } =>
      ShowGraftViewPropsStatement(parts, key, output)
    case sp @ org.apache.spark.sql.catalyst.plans.logical
        .ShowTableProperties(
          org.apache.spark.sql.catalyst.analysis.UnresolvedTable(
            parts, _, _), key, output)
        if GraftViews.resolveView(session(), parts)
          .exists { case (g, id) => g.viewExists(id) } =>
      ShowGraftViewPropsStatement(parts, key, output)
    case a @ AnalyzeColumn(UnresolvedTableOrView(parts, _, _), cols, all)
        if GraftViews.resolveView(session(), parts).isDefined =>
      AnalyzeGraftTableStatement(parts, cols.getOrElse(Nil), all)
    // plain COMPUTE STATISTICS (incl. NOSCAN — the one pass here is
    // the cheapest exact rowcount this format has anyway)
    case a @ AnalyzeTable(UnresolvedTableOrView(parts, _, _), spec, _)
        if spec.isEmpty &&
          GraftViews.resolveView(session(), parts).isDefined =>
      AnalyzeGraftTableStatement(parts, Nil, allColumns = false)
    case other => other
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    retarget(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(
      sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** The view resolution bridge (see [[GraftViews]]): expands reads of
  * stored views and converts the parser's statement nodes into
  * runnable commands. */
final case class GraftViewResolution(session: SparkSession)
    extends Rule[LogicalPlan] {

  /** Expand a stored view: parse the definition, substitute its own
    * CTEs (the Substitution batch already ran for the outer plan and
    * will not run again for a subtree introduced mid-resolution),
    * qualify remaining unqualified table references with the view's
    * CREATE-time catalog/namespace (subqueries included), and apply
    * declared column aliases. The result re-enters the resolution
    * fixed point — nested views expand level by level. */
  private def expand(g: GraftCatalog, ident: Identifier,
      v: View): LogicalPlan = {
    val parsed = CTESubstitution(
      session.sessionState.sqlParser.parsePlan(v.query))
    // qualification is UNCONDITIONAL: CREATE refused temp-view
    // references, so every stored unqualified name means a catalog
    // object — consulting the READER's temp views here would let a
    // reader-local temp view silently hijack the stored definition's
    // tables, contradicting the same-from-any-session contract
    val qualified = parsed.transformDownWithSubqueries {
      case u: UnresolvedRelation if u.multipartIdentifier.length <= 2 &&
          !u.isStreaming =>
        val full = u.multipartIdentifier match {
          case Seq(one) =>
            (v.currentCatalog +: v.currentNamespace.toSeq) :+ one
          case two => v.currentCatalog +: two
        }
        u.copy(multipartIdentifier = full.toSeq)
    }
    val aliased =
      if (v.columnAliases == null || v.columnAliases.isEmpty) qualified
      else UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, qualified)
    SubqueryAlias((g.name +: ident.namespace.toSeq) :+ ident.name, aliased)
  }

  /** Load the cached-probed view, or None when the cache was STALE
    * (another session dropped the view inside the TTL window): the
    * miss invalidates the namespace entry and re-probes exactly once,
    * so the relation falls through to table resolution instead of
    * failing the reader's query on a view that no longer exists. A
    * load that fails while the exact re-probe still sees the view is
    * a genuine storage error and surfaces. */
  private def loadUnlessStale(g: GraftCatalog,
      ident: Identifier): Option[View] =
    try Some(g.loadView(ident))
    catch {
      case e: NoSuchViewException =>
        if (g.reprobeView(ident)) throw e else None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.isStreaming =>
        GraftViews.resolveView(session, u.multipartIdentifier) match {
          case Some((g, ident)) if g.viewExistsCached(ident) =>
            loadUnlessStale(g, ident) match {
              case None => u // dropped cross-session: not a view anymore
              case Some(v) =>
                GraftViews.streamingComposition(session, g, v,
                    u.options) match {
                  case Some(plan) =>
                    // a stateless single-table view: the stream is the
                    // view's transforms composed over the underlying
                    // table's stream (CREATE-time context, declared
                    // aliases applied inside the composition)
                    SubqueryAlias(
                      (g.name +: ident.namespace.toSeq) :+ ident.name,
                      plan)
                  case None =>
                    throw new UnsupportedOperationException(
                      s"cannot STREAM from view ${u.multipartIdentifier
                        .mkString(".")} — its definition is not a " +
                        "stateless projection/filter over one table " +
                        "(aggregates, joins, windows, subqueries and " +
                        "non-deterministic functions have no row-by-row " +
                        "change feed); readStream.table the underlying " +
                        "snapshot table (or its change feed) instead")
                }
            }
          case _ => u
        }
      case u: UnresolvedRelation if !u.isStreaming =>
        GraftViews.resolveView(session, u.multipartIdentifier) match {
          // the TTL-cached probe: this match runs for every relation
          // name on every analyzer iteration — an uncached fs.exists
          // would cost a storage round trip per relation per iteration
          case Some((g, ident)) if g.viewExistsCached(ident) =>
            loadUnlessStale(g, ident)
              .map(expand(g, ident, _)).getOrElse(u)
          case _ => u
        }
      case s: CreateGraftViewStatement if s.query.resolved =>
        val (g, ident) = GraftViews.resolveView(session, s.nameParts)
          .getOrElse(throw new IllegalStateException(
            s"view identifier ${s.nameParts.mkString(".")} no longer " +
              "resolves to a graft catalog"))
        val cm = session.sessionState.catalogManager
        CreateGraftViewCommand(g, ident, s.userCols, s.comment, s.props,
          s.originalText, s.query.schema,
          allowExisting = s.allowExisting, replace = s.replace,
          curCatalog = cm.currentCatalog.name,
          curNamespace = cm.currentNamespace.toSeq)
      case d: DropGraftViewStatement =>
        val (g, ident) = GraftViews.resolveView(session, d.nameParts)
          .getOrElse(throw new IllegalStateException(
            s"view identifier ${d.nameParts.mkString(".")} no longer " +
              "resolves to a graft catalog"))
        DropGraftViewCommand(g, ident, d.ifExists)
      case s: ShowGraftViewsStatement =>
        val (g, ns) = GraftViews.resolveNamespace(session, s.nsParts)
          .getOrElse(throw new IllegalStateException(
            s"namespace ${s.nsParts.mkString(".")} no longer resolves " +
              "to a graft catalog"))
        ShowGraftViewsCommand(g, ns, s.pattern, s.output)
      case a: AlterGraftViewAsStatement if a.query.resolved =>
        val (g, ident) = GraftViews.resolveView(session, a.nameParts)
          .getOrElse(throw new IllegalStateException(
            s"view identifier ${a.nameParts.mkString(".")} no longer " +
              "resolves to a graft catalog"))
        AlterGraftViewAsCommand(g, ident, a.originalText, a.query.schema,
          curCatalog = session.sessionState.catalogManager
            .currentCatalog.name,
          curNamespace = session.sessionState.catalogManager
            .currentNamespace.toSeq)
      case a: AnalyzeGraftTableStatement =>
        val (g, ident) = GraftViews.resolveView(session, a.nameParts)
          .getOrElse(throw new IllegalStateException(
            s"table identifier ${a.nameParts.mkString(".")} no longer " +
              "resolves to a graft catalog"))
        AnalyzeGraftTableCommand(g, ident,
          if (a.allColumns) Nil else a.columns)
      case s: ShowCreateGraftViewStatement =>
        val (g, ident) = GraftViews.resolveView(session, s.nameParts)
          .getOrElse(throw new IllegalStateException(
            s"view identifier ${s.nameParts.mkString(".")} no longer " +
              "resolves to a graft catalog"))
        ShowCreateGraftViewCommand(g, ident, s.output)
      case d: DescribeGraftViewStatement =>
        val (g, ident) = GraftViews.resolveView(session, d.nameParts)
          .getOrElse(throw new IllegalStateException(
            s"view identifier ${d.nameParts.mkString(".")} no longer " +
              "resolves to a graft catalog"))
        DescribeGraftViewCommand(g, ident, d.isExtended, d.output)
      case p: ShowGraftViewPropsStatement =>
        val (g, ident) = GraftViews.resolveView(session, p.nameParts)
          .getOrElse(throw new IllegalStateException(
            s"view identifier ${p.nameParts.mkString(".")} no longer " +
              "resolves to a graft catalog"))
        ShowGraftViewPropsCommand(g, ident, p.propertyKey, p.output)
    }
}

/** `CREATE [OR REPLACE] VIEW` against a [[GraftCatalog]]. Captures
  * the analyzed query's schema and the session's CREATE-time
  * catalog/namespace (the resolution context every later expansion
  * re-applies); refuses definitions referencing temp views. */
final case class CreateGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, userCols: Seq[(String, Option[String])],
    comment: Option[String], props: Map[String, String],
    originalText: Option[String], viewSchema: StructType,
    allowExisting: Boolean, replace: Boolean,
    curCatalog: String, curNamespace: Seq[String])
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val sql = originalText.getOrElse(throw new IllegalArgumentException(
      s"CREATE VIEW $ident needs the original SQL text to persist"))
    // a PERSISTED definition over SESSION-local state would dangle in
    // every other session — the standard refusal
    val parsed = CTESubstitution(
      session.sessionState.sqlParser.parsePlan(sql))
    parsed.foreachWithSubqueries {
      case u: UnresolvedRelation
          if session.sessionState.catalog
            .isTempView(u.multipartIdentifier) =>
        throw new IllegalArgumentException(
          s"cannot CREATE VIEW ${ident}: the definition references " +
            s"temp view ${u.multipartIdentifier.mkString(".")} — a " +
            "persisted view over session-local state would dangle in " +
            "every other session; persist the source as a table or " +
            "view first")
      case _ =>
    }
    if (userCols.nonEmpty)
      require(userCols.size == viewSchema.size,
        s"CREATE VIEW $ident: ${userCols.size} column aliases for a " +
          s"${viewSchema.size}-column query")
    val aliases = userCols.map(_._1)
    val comments = userCols.map(_._2.orNull)
    // a REPLACE can close a reference cycle through EXISTING views
    // (v -> w -> v); refuse at DDL time instead of looping every
    // future read into the analyzer's iteration cap. (A plain CREATE
    // cannot: the name does not resolve as a view until it exists.)
    if (replace)
      GraftViews.findCycle(session, catalog, ident, sql, curCatalog,
        curNamespace).foreach { path =>
        throw new IllegalArgumentException(
          s"cannot CREATE OR REPLACE VIEW $ident: the new definition " +
            s"closes a view reference cycle (${path.mkString(" -> ")})" +
            " — every read through it would fail; break the cycle " +
            "first")
      }
    val info = new ViewInfo(ident, sql, curCatalog, curNamespace.toArray,
      viewSchema, viewSchema.fieldNames, aliases.toArray, comments.toArray,
      (props ++ comment.map("comment" -> _)).asJava)
    if (replace) catalog.replaceView(info, true)
    else if (catalog.viewExists(ident)) {
      if (!allowExisting) throw new ViewAlreadyExistsException(ident)
    } else catalog.createView(info)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS]` against a [[GraftCatalog]]. */
final case class DropGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val dropped = catalog.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

/** `ALTER VIEW ... AS <query>` against a [[GraftCatalog]]: replaces
  * the stored definition (refusing temp-view references like CREATE),
  * keeps the view's properties, resets column aliases (the new query
  * names its own columns — SQL semantics). */
final case class AlterGraftViewAsCommand(catalog: GraftCatalog,
    ident: Identifier, originalText: String, viewSchema: StructType,
    curCatalog: String, curNamespace: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val old = catalog.loadView(ident) // throws NoSuchViewException
    val parsed = CTESubstitution(
      session.sessionState.sqlParser.parsePlan(originalText))
    parsed.foreachWithSubqueries {
      case u: UnresolvedRelation
          if session.sessionState.catalog
            .isTempView(u.multipartIdentifier) =>
        throw new IllegalArgumentException(
          s"cannot ALTER VIEW $ident: the new definition references " +
            s"temp view ${u.multipartIdentifier.mkString(".")} — a " +
            "persisted view over session-local state would dangle in " +
            "every other session")
      case _ =>
    }
    // same DDL-time cycle refusal as CREATE OR REPLACE: an ALTER that
    // makes the definition reach itself would fail every future read
    GraftViews.findCycle(session, catalog, ident, originalText,
      curCatalog, curNamespace).foreach { path =>
      throw new IllegalArgumentException(
        s"cannot ALTER VIEW $ident: the new definition closes a view " +
          s"reference cycle (${path.mkString(" -> ")}) — every read " +
          "through it would fail; break the cycle first")
    }
    val info = new ViewInfo(ident, originalText, curCatalog,
      curNamespace.toArray, viewSchema, viewSchema.fieldNames,
      Array.empty[String], Array.empty[String], old.properties)
    catalog.replaceView(info, false)
    Seq.empty
  }
}

/** `ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS]` against a
  * [[GraftCatalog]] — routes to [[graft.ops.Snapshots.analyzeColumns]]
  * (row count + per-column NDV/null stats committed as table
  * properties, surfaced to the cost-based optimizer). */
final case class AnalyzeGraftTableCommand(catalog: GraftCatalog,
    ident: Identifier, columns: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!catalog.tableExists(ident)) throw new NoSuchTableException(ident)
    graft.ops.Snapshots.analyzeColumns(session,
      catalog.tableDir(ident), columns)
    Seq.empty
  }
}

/** `SHOW CREATE TABLE` over a graft VIEW — renders the re-runnable
  * CREATE VIEW statement from the stored document: declared column
  * aliases with their comments, the view comment, user TBLPROPERTIES,
  * and the original definition SQL. */
final case class ShowCreateGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident) // throws NoSuchViewException
    def lit(s: String): String = "'" + s.replace("'", "\\'") + "'"
    def id(s: String): String = "`" + s.replace("`", "``") + "`"
    val sb = new StringBuilder(s"CREATE VIEW ${v.name}")
    if (v.columnAliases != null && v.columnAliases.nonEmpty) {
      val comments = Option(v.columnComments)
        .getOrElse(Array.empty[String])
      sb.append(" (\n").append(v.columnAliases.zipWithIndex.map {
        case (a, i) =>
          val c = comments.lift(i).flatMap(Option(_))
            .map(c0 => s" COMMENT ${lit(c0)}").getOrElse("")
          s"  ${id(a)}$c"
      }.mkString(",\n")).append(")")
    }
    val props = v.properties.asScala.toMap
    props.get("comment").foreach(c => sb.append(s"\nCOMMENT ${lit(c)}"))
    val user = (props - "comment").toSeq.sortBy(_._1)
    if (user.nonEmpty)
      sb.append("\nTBLPROPERTIES (\n").append(user.map { case (k, x) =>
        s"  ${lit(k)} = ${lit(x)}"
      }.mkString(",\n")).append(")")
    sb.append("\nAS ").append(v.query)
    Seq(Row(sb.toString))
  }
}

/** `DESCRIBE [EXTENDED]` over a graft VIEW: the column list under the
  * view's OWN names (declared aliases when present, the stored query
  * schema's otherwise) with per-column comments; EXTENDED appends the
  * detailed-view-information block (definition text, CREATE-time
  * resolution context, comment, user properties) in the session-
  * catalog layout tools already parse. */
final case class DescribeGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident) // throws NoSuchViewException
    val aliases = Option(v.columnAliases).filter(_.nonEmpty)
    val comments = Option(v.columnComments)
      .getOrElse(Array.empty[String])
    val cols = v.schema.fields.zipWithIndex.map { case (f, i) =>
      val name = aliases.flatMap(_.lift(i)).getOrElse(f.name)
      val comment =
        if (aliases.nonEmpty) comments.lift(i).flatMap(Option(_))
        else None
      Row(name, f.dataType.simpleString, comment.orNull)
    }.toSeq
    val detail = if (!isExtended) Nil else {
      val props = v.properties.asScala.toMap
      Seq(Row("", "", ""),
        Row("# Detailed View Information", "", ""),
        Row("Catalog", catalog.name, ""),
        Row("Namespace", ident.namespace.mkString("."), ""),
        Row("Name", ident.name, ""),
        Row("Type", "VIEW", "")) ++
        props.get("comment").map(Row("Comment", _, "")).toSeq ++
        Seq(Row("View Text", v.query, ""),
          Row("View Catalog and Namespace",
            (v.currentCatalog +: v.currentNamespace.toSeq).mkString("."),
            ""),
          Row("View Query Output Columns",
            Option(v.queryColumnNames).getOrElse(Array.empty[String])
              .mkString("[", ", ", "]"), "")) ++ {
          val user = (props - "comment").toSeq.sortBy(_._1)
          if (user.isEmpty) Nil
          else Seq(Row("View Properties",
            user.map { case (k, x) => s"$k=$x" }
              .mkString("[", ", ", "]"), ""))
        }
    }
    cols ++ detail
  }
}

/** `SHOW TBLPROPERTIES` over a graft VIEW: all stored user properties
  * (two-column form), or the one requested key's value — with the
  * session catalog's not-found message, not an analysis error. */
final case class ShowGraftViewPropsCommand(catalog: GraftCatalog,
    ident: Identifier, propertyKey: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident) // throws NoSuchViewException
    val props = v.properties.asScala.toMap
    propertyKey match {
      case Some(k) =>
        val value = props.getOrElse(k,
          s"View ${(catalog.name +: ident.namespace.toSeq :+ ident.name)
            .mkString(".")} does not have property: $k")
        // the parsed node dictates the arity (Spark's keyed form
        // returns (key, value) rows)
        if (output.lengthCompare(2) >= 0) Seq(Row(k, value))
        else Seq(Row(value))
      case None => props.toSeq.sortBy(_._1).map { case (k, x) => Row(k, x) }
    }
  }
}

/** `SHOW VIEWS [IN ns] [LIKE pattern]` against a [[GraftCatalog]] —
  * carries the original node's output attributes so downstream
  * projections over the command output bind unchanged. */
final case class ShowGraftViewsCommand(catalog: GraftCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val names = catalog.listViews(namespace: _*).map(_.name).toSeq.sorted
    val filtered = pattern match {
      case Some(p) => org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(names, p)
      case None => names
    }
    filtered.map(n => Row(namespace.mkString("."), n, false))
  }
}
