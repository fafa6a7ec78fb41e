package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{FieldName, RelationTimeTravel, UnresolvedRelation, UnresolvedTable, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GraftRelation, VersionedTable}

/** SQL surface for graft SCHEMA EVOLUTION and TIME TRAVEL — the two
  * statement families stock Spark rejects outright for V1 relations
  * ("RENAME COLUMN is only supported with v2 tables", "time travel is
  * not supported"). They cannot ride the resolution-rule path the way
  * MERGE/UPDATE/DELETE do ([[GraftMergeRule]]): `ResolveSessionCatalog`
  * sits EARLIER in the same resolution batch and throws on the
  * resolved V1 node before any injected rule runs. So this wraps the
  * session PARSER instead (the Delta pattern): the delegate parses
  * every statement as usual, and the wrapper rewrites exactly the
  * plan shapes above — and only when the target identifier provably
  * names a graft table (session-catalog provider `graft`, or a temp
  * view directly over a [[GraftRelation]]) — onto the engine's own
  * verbs. Every non-graft statement passes through byte-identical.
  *
  * Supported, mapped one-to-one onto `VersionedTable`:
  *
  *   ALTER TABLE t RENAME COLUMN a TO b        → renameColumn
  *   ALTER TABLE t DROP COLUMN [IF EXISTS] a   → dropColumn
  *   ALTER TABLE t ADD COLUMN a TYPE           → addColumn
  *   ALTER TABLE t ALTER COLUMN a TYPE wider   → widenColumn
  *   SELECT … FROM t VERSION AS OF 3           → versionAsOf read
  *   SELECT … FROM t VERSION AS OF 'ref'       → refAsOf read
  *   SELECT … FROM t TIMESTAMP AS OF '…'       → newest commit ≤ ts
  *
  * Shapes the engine cannot express one-to-one fail LOUDLY at parse
  * time (nested fields, NOT NULL adds, comments, column positions,
  * DEFAULT values, nullability/comment/position alters, non-literal
  * time-travel timestamps): a silent drift from the statement's SQL
  * meaning would be worse than a clear error naming the API verb.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    try rewrite(delegate.parsePlan(sqlText))
    catch {
      // OPTIMIZE / VACUUM are not in stock Spark's grammar at all
      // (Delta adds them through its own parser): a statement the
      // delegate REJECTS gets one shot at the two maintenance forms
      // before the original ParseException propagates — so no parse
      // behavior is ever stolen from valid Spark SQL.
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        maintenanceStatement(sqlText).getOrElse(throw e)
    }

  override def parsePlanWithParameters(sqlText: String,
      parameters: ParameterContext): LogicalPlan =
    try rewrite(delegate.parsePlanWithParameters(sqlText, parameters))
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        maintenanceStatement(sqlText).getOrElse(throw e)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(
      sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(
      sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(
      sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(
      sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)

  // ---- the rewrite ----

  private def rewrite(plan: LogicalPlan): LogicalPlan =
    describeHistory(plan).getOrElse(plan.transformUp {
      case r @ RenameColumn(UnresolvedTable(ident, _, _), from, to) =>
        graftTable(ident).map { case (root, ti) =>
          GraftAlterCommand(root, ti,
            Seq(GraftAlterOp.Rename(single(from), to))): LogicalPlan
        }.getOrElse(r)
      case d @ DropColumns(UnresolvedTable(ident, _, _), cols,
          ifExists) =>
        graftTable(ident).map { case (root, ti) =>
          GraftAlterCommand(root, ti, cols.map(c =>
            GraftAlterOp.Drop(single(c), ifExists))): LogicalPlan
        }.getOrElse(d)
      case a @ AddColumns(UnresolvedTable(ident, _, _), cols) =>
        graftTable(ident).map { case (root, ti) =>
          GraftAlterCommand(root, ti, cols.map(addOp)): LogicalPlan
        }.getOrElse(a)
      case a @ AlterColumns(UnresolvedTable(ident, _, _), specs) =>
        graftTable(ident).map { case (root, ti) =>
          GraftAlterCommand(root, ti, specs.map(widenOp)): LogicalPlan
        }.getOrElse(a)
      case tt @ RelationTimeTravel(
          UnresolvedRelation(ident, _, false), ts, ver) =>
        graftTable(ident).map { case (root, _) =>
          timeTravelRelation(root, ident, ts, ver)
        }.getOrElse(tt)
      // table_changes('<table or root>', from [, to]) — the Delta
      // change-data-feed TABLE-VALUED FUNCTION, batch form: rewrites
      // at parse time onto the engine's delta-sized CDF read
      // ([[VersionedTable.changeDelta]] — never the full snapshot
      // diff), spliced in as an already-analyzed subtree. `from` is
      // INCLUSIVE and `to` defaults to the table head (both the Delta
      // contract); version 0's initial inserts arrive as an
      // insert-tagged snapshot slice. Any shape this rewrite cannot
      // bind — non-literal args, an identifier that is not provably a
      // graft table — passes through UNTOUCHED, so a user-defined TVF
      // of the same name (or a typo) gets the stock resolution error,
      // never a graft one.
      case tvf @ UnresolvedTableValuedFunction(Seq(fn), args, _)
          if fn.equalsIgnoreCase("table_changes") =>
        val lits = args.map {
          case Literal(v: UTF8String, StringType) => Some(v.toString)
          case Literal(v: Int, _) => Some(v.toLong)
          case Literal(v: Long, _) => Some(v.toLong)
          case _ => None
        }
        val resolved = lits match {
          case Seq(Some(t: String), Some(from: Long)) =>
            Some((t, from, None))
          case Seq(Some(t: String), Some(from: Long), Some(to: Long)) =>
            Some((t, from, Some(to)))
          case _ => None
        }
        resolved.flatMap { case (t, from, to) =>
          // a catalog table / temp view name, or a raw table root —
          // both probes Try-guarded: lookup failures must never leak
          // out of the PARSER for statements we do not own
          graftTable(t.split('.').toIndexedSeq).map(_._1)
            .orElse(
              if (scala.util.Try(
                  VersionedTable.latestVersion(session, t))
                  .toOption.flatten.isDefined) Some(t)
              else None)
            .map { root =>
              val end = to.getOrElse(
                VersionedTable.latestVersion(session, root).getOrElse(
                  sys.error(s"no committed version at $root")))
              require(from >= 0 && from <= end,
                s"table_changes range [$from, $end] is invalid for " +
                  s"$root (head is $end)")
              val tail =
                if (from > 0)
                  Some(VersionedTable.changeDelta(session, root,
                    from - 1, end))
                else if (end > 0)
                  Some(VersionedTable.changeDelta(session, root,
                    0, end))
                else None
              // from = 0 includes the initial commit: v0's content as
              // insert-tagged rows, projected onto the CDF schema
              // (name-matched, cast, null-filled — the same shaping
              // rule changeDelta applies to its own slices)
              val df = (from, tail) match {
                case (0, maybeTail) =>
                  import org.apache.spark.sql.functions.{col, lit}
                  val base = VersionedTable
                    .readVersion(session, root, 0L)
                    .withColumn("_change_type", lit("insert"))
                    .withColumn("_commit_version", lit(0L))
                  maybeTail.map { cd =>
                    val have = base.columns.toSet
                    base.select(cd.schema.fields.toIndexedSeq.map { f =>
                      (if (have(f.name)) col(f.name).cast(f.dataType)
                       else lit(null).cast(f.dataType)).as(f.name)
                    }: _*).unionByName(cd)
                  }.getOrElse(base)
                case (_, Some(cd)) => cd
                case _ => sys.error("unreachable: from > 0 implies " +
                  "a change delta")
              }
              SubqueryAlias("table_changes",
                df.queryExecution.analyzed): LogicalPlan
            }
        }.getOrElse(tvf)
      // a GENUINE `CREATE TABLE (cols…) USING graft` on an
      // already-committed root validates its declared column list
      // against the manifest HERE — the one place that can tell a
      // user-typed DDL declaration apart from the session catalog
      // replaying its stored schema at resolution time (which may
      // legitimately lag the manifest after evolution; the relation
      // provider only warns there). Delta's rule: a typo'd DDL fails
      // loudly instead of silently binding to the manifest.
      case ct @ CreateTable(_, columns, _, spec: UnresolvedTableSpec, _)
          if spec.provider.exists(_.equalsIgnoreCase("graft")) &&
            columns.nonEmpty =>
        // OPTIONS are still expressions at parse time — only a
        // literal path can gate here (non-literal paths just skip the
        // check and fall back to the provider-level warning)
        val root = spec.optionExpression.options.collectFirst {
          case (k, Literal(v: UTF8String, StringType))
              if k.equalsIgnoreCase("path") => v.toString
        }.orElse(spec.location)
        root.flatMap(r =>
            VersionedTable.latestVersion(session, r).map((r, _)))
          .foreach { case (r, v) =>
            def shape(fs: Seq[(String, String)]) = fs.map {
              case (n, t) => n.toLowerCase -> t }.toMap
            val declared = shape(columns.map(c =>
              c.name -> c.dataType.simpleString))
            val actual = shape(VersionedTable
              .snapshotSchema(session, r, v).fields.toIndexedSeq
              .map(f => f.name -> f.dataType.simpleString))
            if (declared != actual)
              throw new IllegalArgumentException(
                s"CREATE TABLE schema does not match the committed " +
                  s"graft table at $r: declared ${declared.toSeq.sorted
                    .mkString(", ")} vs manifest ${actual.toSeq.sorted
                    .mkString(", ")} — drop the column list or fix it")
          }
        ct
    })

  /** Resolves a statement identifier to a graft table root: a
    * session-catalog table whose provider is `graft` (path from its
    * OPTIONS), or a temp view planned directly over a
    * [[GraftRelation]]. Anything else — including identifiers the
    * catalog does not know — is None, and the statement flows to the
    * stock analyzer untouched. Lookup failures must never leak out of
    * the PARSER for non-graft statements.
    */
  private def graftTable(
      ident: Seq[String]): Option[(String, Option[TableIdentifier])] = {
    val cat = session.sessionState.catalog
    val ti = ident match {
      case Seq(t) => Some(TableIdentifier(t))
      case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
      case Seq(c, db, t) if c.equalsIgnoreCase("spark_catalog") =>
        Some(TableIdentifier(t, Some(db)))
      case _ => None
    }
    val fromCatalog = ti.flatMap { id =>
      scala.util.Try(cat.getTableMetadata(id)).toOption.flatMap { m =>
        if (m.provider.exists(_.equalsIgnoreCase("graft")))
          // CREATE TABLE … OPTIONS (path '…') lands in locationUri,
          // not storage.properties — check both
          m.storage.properties.map { case (k, v) => k.toLowerCase -> v }
            .get("path")
            .orElse(m.storage.locationUri.map(
              org.apache.spark.sql.catalyst.catalog.CatalogUtils
                .URIToString))
            .map(_ -> Some(id))
        else None
      }
    }
    def fromTempView = ident match {
      case Seq(t) =>
        scala.util.Try(cat.getTempView(t)).toOption.flatten
          .flatMap(_.collectFirst {
            case LogicalRelation(g: GraftRelation, _, _, _, _) =>
              (g.root, None)
          })
      case _ => None
    }
    fromCatalog.orElse(fromTempView)
  }

  /** The two maintenance statements, Delta-shaped:
    *
    *   OPTIMIZE <table> [ZORDER BY (c1, c2, …)]
    *   VACUUM <table> [RETAIN <n> VERSIONS]
    *
    * OPTIMIZE without dimensions routes through the policy dispatch
    * ([[VersionedTable.compactDeletes]] — folds MoR deletes and
    * preserves whatever clustering/stats the snapshot carried);
    * ZORDER BY recomputes the multi-dimension layout. VACUUM's
    * retention is VERSION-count based (the engine's own unit —
    * explicit, unlike Delta's wall-clock hours; default keeps 2).
    * Only fires for identifiers that provably name graft tables; any
    * other statement re-raises the delegate's own ParseException.
    */
  private def maintenanceStatement(sql: String): Option[LogicalPlan] = {
    val opt = ("""(?is)^\s*OPTIMIZE\s+([\w.`]+)\s*""" +
      """(?:ZORDER\s+BY\s*\(([^)]+)\)\s*)?;?\s*$""").r
    val vac = ("""(?is)^\s*VACUUM\s+([\w.`]+)\s*""" +
      """(?:RETAIN\s+(\d+)\s+VERSIONS\s*)?;?\s*$""").r
    val restore = ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?([\w.`]+)\s+""" +
      """TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
    def ident(raw: String): Seq[String] =
      raw.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
    sql match {
      case restore(raw, v) =>
        graftTable(ident(raw)).map { case (root, _) =>
          GraftRestoreCommand(root, v.toLong)
        }
      case opt(raw, dims) =>
        graftTable(ident(raw)).map { case (root, _) =>
          val zdims = Option(dims).toSeq.flatMap(_.split(',').toSeq)
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty)
          GraftOptimizeCommand(root, zdims)
        }
      case vac(raw, keep) =>
        graftTable(ident(raw)).map { case (root, _) =>
          GraftVacuumCommand(root,
            Option(keep).map(_.toInt).getOrElse(2))
        }
      case _ => None
    }
  }

  /** `DESCRIBE HISTORY t` never reaches the ParseException fallback:
    * stock Spark PARSES it as "describe column t of table HISTORY"
    * (DescribeColumn over UnresolvedTableOrView(["HISTORY"])). That
    * statement can only fail at analysis UNLESS a table or view
    * literally named `history` exists — so the rewrite requires BOTH
    * that no such relation resolves (the stock statement would have
    * worked; it keeps its meaning) AND that the "column" provably
    * names a graft table.
    */
  private def describeHistory(p: LogicalPlan): Option[LogicalPlan] =
    p match {
      case DescribeColumn(
          org.apache.spark.sql.catalyst.analysis
            .UnresolvedTableOrView(Seq(h), _, _),
          colExpr: org.apache.spark.sql.catalyst.analysis
            .UnresolvedAttribute, _, _)
          if h.equalsIgnoreCase("history") && !relationExists(h) =>
        graftTable(colExpr.nameParts)
          .map { case (root, _) => GraftHistoryCommand(root) }
      case _ => None
    }

  private def relationExists(name: String): Boolean =
    scala.util.Try {
      val cat = session.sessionState.catalog
      cat.tableExists(TableIdentifier(name)) ||
        cat.getTempView(name).isDefined ||
        cat.getGlobalTempView(name).isDefined
    }.getOrElse(false)

  private def fail(what: String): Nothing =
    throw new UnsupportedOperationException(
      "graft ALTER TABLE supports RENAME COLUMN, DROP COLUMN " +
        "[IF EXISTS], ADD COLUMN <name> <type>, and ALTER COLUMN " +
        "<name> TYPE <losslessly-wider type> on top-level columns — " +
        s"unsupported: $what (use the VersionedTable API for richer " +
        "shapes)")

  private def single(f: FieldName): String = f.name match {
    case Seq(n) => n
    case nested => fail(s"nested field ${nested.mkString(".")}")
  }

  private def addOp(c: QualifiedColType): GraftAlterOp = {
    if (c.path.nonEmpty)
      fail(s"nested ADD COLUMN ${c.path.get.name.mkString(".")}")
    if (!c.nullable) fail("ADD COLUMN … NOT NULL (pre-evolution " +
      "rows read the new column as NULL by construction)")
    if (c.comment.nonEmpty) fail("ADD COLUMN … COMMENT")
    if (c.position.nonEmpty) fail("ADD COLUMN … FIRST/AFTER")
    if (c.default.nonEmpty) fail("ADD COLUMN … DEFAULT")
    GraftAlterOp.Add(c.colName, c.dataType.sql)
  }

  private def widenOp(s: AlterColumnSpec): GraftAlterOp = {
    val dt = s.newDataType.getOrElse(
      fail("ALTER COLUMN without a TYPE clause"))
    if (s.newNullability.nonEmpty)
      fail("ALTER COLUMN … SET/DROP NOT NULL")
    if (s.newComment.nonEmpty) fail("ALTER COLUMN … COMMENT")
    if (s.newPosition.nonEmpty) fail("ALTER COLUMN … FIRST/AFTER")
    if (s.newDefaultExpression.nonEmpty || s.dropDefault)
      fail("ALTER COLUMN … DEFAULT")
    GraftAlterOp.Widen(single(s.column), dt.sql)
  }

  /** `VERSION AS OF` / `TIMESTAMP AS OF` → a PINNED [[GraftRelation]]
    * planned at parse time (the reader-option path, exactly). The
    * version string may be a snapshot id or a named ref; a timestamp
    * must be a literal (epoch millis, ISO date, or ISO date-time,
    * UTC) and binds to the NEWEST commit at or before the instant —
    * the Delta rule, resolved against manifest-recorded commit times.
    */
  private def timeTravelRelation(root: String, ident: Seq[String],
      ts: Option[Expression], ver: Option[String]): LogicalPlan = {
    val v = (ver, ts) match {
      case (Some(s), None) =>
        s.toLongOption.getOrElse(
          VersionedTable.resolveRef(session, root, s))
      case (None, Some(e)) =>
        val millis = tsMillis(e)
        val vs = VersionedTable.versions(session, root)
        vs.filter(x =>
            VersionedTable.commitTimeMs(session, root, x) <= millis)
          .lastOption.getOrElse(sys.error(
            s"no commit at or before TIMESTAMP AS OF $millis " +
              s"(epoch ms) at $root — the table's first commit is " +
              "newer"))
      case _ => sys.error("time travel needs exactly one of " +
        "VERSION AS OF / TIMESTAMP AS OF")
    }
    require(VersionedTable.versions(session, root).contains(v),
      s"no committed version $v at $root")
    val rel = GraftRelation(session.sqlContext, root, Some(v))
    SubqueryAlias(ident.last, LogicalRelation(rel, isStreaming = false))
  }

  private def tsMillis(e: Expression): Long = e match {
    case Cast(c, _, _, _) => tsMillis(c)
    case Literal(v: UTF8String, StringType) =>
      val s = v.toString
      s.toLongOption.getOrElse {
        val t = scala.util.Try(
            java.time.LocalDateTime.parse(s.replace(' ', 'T')))
          .getOrElse(java.time.LocalDate.parse(s).atStartOfDay())
        t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }
    case Literal(v: Long, _: TimestampType) => v / 1000L
    case Literal(v: Long, LongType) => v
    // DATE literals carry days-since-epoch as an Int — NOT millis
    case Literal(v: Int, org.apache.spark.sql.types.DateType) =>
      v.toLong * 86400000L
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
      v.toLong
    case other => fail(s"non-literal TIMESTAMP AS OF: $other")
  }
}

/** One ALTER TABLE statement's column operations, applied in order
  * through the engine's metadata-only evolution verbs. Each op is one
  * manifest commit (the statement is NOT atomic across multiple ops —
  * same as Spark's own multi-action ALTER on V2 catalogs); the
  * session catalog entry refreshes afterwards so cached relations
  * re-resolve the new schema.
  */
case class GraftAlterCommand(root: String,
    table: Option[TableIdentifier], ops: Seq[GraftAlterOp])
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    var last = -1L
    ops.foreach {
      case GraftAlterOp.Rename(from, to) =>
        last = VersionedTable.renameColumn(session, root, from, to,
          tag = s"sql-rename-$from")
      case GraftAlterOp.Drop(name, ifExists) =>
        val v = VersionedTable.latestVersion(session, root).getOrElse(
          sys.error(s"no committed version at $root"))
        val present = VersionedTable.snapshotSchema(session, root, v)
          .fieldNames.contains(name)
        if (present)
          last = VersionedTable.dropColumn(session, root, name,
            tag = s"sql-drop-$name")
        else if (!ifExists)
          sys.error(s"no column $name to drop at $root " +
            "(use DROP COLUMN IF EXISTS)")
      case GraftAlterOp.Add(name, ddl) =>
        last = VersionedTable.addColumn(session, root, name, ddl,
          tag = s"sql-add-$name")
      case GraftAlterOp.Widen(name, ddl) =>
        last = VersionedTable.widenColumn(session, root, name, ddl,
          tag = s"sql-widen-$name")
    }
    // the session catalog STORES the table schema and replays it at
    // every resolution — re-sync it to the evolved manifest, then
    // drop the cached relation (pre-ALTER attribute ids) so the next
    // statement re-resolves fresh
    table.foreach { t =>
      val v = VersionedTable.latestVersion(session, root).getOrElse(
        sys.error(s"no committed version at $root after ALTER"))
      val cat = session.sessionState.catalog
      // alterTable (not alterTableDataSchema, which refuses renames
      // and drops): the manifest already applied the change — the
      // catalog copy is a mirror, never the authority
      cat.alterTable(cat.getTableMetadata(t).copy(
        schema = VersionedTable.snapshotSchema(session, root, v)))
      session.catalog.refreshTable(t.quotedString)
    }
    Seq(Row(last))
  }

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
}

/** `OPTIMIZE t [ZORDER BY (…)]` — the content-neutral rewrite under
  * the round-14 pinned-base retry, so it is safe to run next to live
  * writers. Returns the new version id.
  */
case class GraftOptimizeCommand(root: String, zorderBy: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v =
      if (zorderBy.nonEmpty)
        VersionedTable.compactZOrder(session, root, zorderBy,
          tag = "sql-optimize")
      else VersionedTable.compactDeletes(session, root,
        tag = "sql-optimize")
    Seq(Row(v))
  }
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
}

/** `VACUUM t [RETAIN n VERSIONS]` — version-count retention (the
  * engine's native unit; refs and streaming pins keep their targets
  * alive regardless). Returns the retained version count.
  */
case class GraftVacuumCommand(root: String, keepLast: Int)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    VersionedTable.vacuum(session, root, keepLast = keepLast)
    Seq(Row(VersionedTable.versions(session, root).size.toLong))
  }
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("retained_versions", LongType,
      nullable = false)())
}

/** `RESTORE [TABLE] t TO VERSION AS OF n` — roll-FORWARD: the old
  * snapshot's content commits as the NEWEST version (history is never
  * rewritten, the standard RESTORE semantics; the undone versions
  * stay time-travelable until vacuum). Returns the new version id.
  */
case class GraftRestoreCommand(root: String, toVersion: Long)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(VersionedTable.rollback(session, root, toVersion,
      tag = s"sql-restore-v$toVersion")))
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
}

/** `DESCRIBE HISTORY t` — the commit audit every lakehouse CLI leans
  * on: one row per RETAINED version (vacuum-expired versions are
  * gone, by design), columns (version, tag, commit_ts_ms,
  * data_change), newest last. Metadata-sized: one manifest read per
  * version, no data I/O.
  */
case class GraftHistoryCommand(root: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] =
    VersionedTable.historyDetail(session, root).map {
      case (v, tag, ts, dc) => Row(v, tag, ts, dc)
    }
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("tag", StringType, nullable = false)(),
      AttributeReference("commit_ts_ms", LongType, nullable = false)(),
      AttributeReference("data_change",
        org.apache.spark.sql.types.BooleanType, nullable = false)())
}

sealed trait GraftAlterOp
object GraftAlterOp {
  case class Rename(from: String, to: String) extends GraftAlterOp
  case class Drop(name: String, ifExists: Boolean) extends GraftAlterOp
  case class Add(name: String, ddl: String) extends GraftAlterOp
  case class Widen(name: String, ddl: String) extends GraftAlterOp
}
