package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SQL surface for the versioned table layer: `spark.read.format
  * ("graft").load(root)` (short name registered via the standard
  * `DataSourceRegister` service file) plans a snapshot read through
  * [[VersionedTable]], so time travel, named refs, merge-on-read
  * deletes, schema evolution and shallow clones all compose with
  * temp views and `spark.sql` — and `df.write.format("graft")`
  * commits through the manifest-last protocol.
  *
  * Read options: `versionAsOf` (snapshot id), `refAsOf` (named
  * tag/branch); default is the newest committed version.
  * Write modes: Overwrite = [[VersionedTable.commit]] (rewrite
  * snapshot), Append = [[VersionedTable.commitAppend]] (fast append,
  * first commit on an empty table), ErrorIfExists / Ignore with their
  * standard meanings. A `tag` option threads the idempotence handle.
  *
  * Scan planning is the V1 `PrunedFilteredScan` contract, DELEGATED
  * to the engine: pushed filters translate (exactly or wider — an
  * untranslatable conjunct simply drops out, which only ever widens)
  * onto a `Column` predicate for [[VersionedTable.readWhereVersion]],
  * so the stats/Bloom sidecars prune FILES before the scan and
  * Catalyst pushes the row-level filters + column projection into the
  * underlying parquet scan as usual; every filter is also reported
  * unhandled, so Spark re-applies them above — correctness never
  * depends on the translation. The returned RDD is the inner plan's
  * own distributed scan (`needConversion = false`, no driver
  * materialization, no row-conversion pass).
  */
class GraftDataSource extends RelationProvider
    with SchemaRelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with DataSourceRegister with org.apache.spark.internal.Logging {

  override def shortName(): String = "graft"

  /** `CREATE TABLE t (cols…) USING graft OPTIONS (path …)` on a root
    * with no committed version yet: commit an EMPTY v0 carrying the
    * declared schema (one zero-row parquet + manifest — the table
    * exists, INSERTs append onto it). On an existing table the
    * manifest remains the source of truth (the standard
    * external-table rule); a declared schema that CONTRADICTS it only
    * WARNS here, because this same entry point serves the session
    * catalog replaying its STORED schema at every resolution — which
    * legitimately lags the manifest when the table evolved through
    * the API without a SQL ALTER. The genuine-DDL case (a user-typed
    * column list in a CREATE statement) fails loudly in
    * [[org.apache.spark.sql.graft.GraftSqlParser]], the one place
    * that can tell the two apart (round-13 advice).
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation = {
    val root = rootOf(parameters)
    val spark = sqlContext.sparkSession
    if (VersionedTable.latestVersion(spark, root).isEmpty) {
      VersionedTable.commit(
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema),
        root, tag = "create-table")
      ()
    }
    // relation first, THEN the declared-schema compare against its
    // own (already-latched) schema — a second snapshotSchema read
    // here would double the metadata I/O every catalog resolution pays
    val rel = createRelation(sqlContext, parameters)
    // name->type comparison, case-insensitive and
    // nullability-insensitive (DDL and manifest legitimately
    // disagree on nullable)
    def shape(s: StructType): Map[String, String] =
      s.fields.map(f =>
        f.name.toLowerCase -> f.dataType.simpleString).toMap
    val declared = shape(schema)
    val actual = shape(rel.schema)
    if (declared != actual)
      logWarning(
        s"declared schema for the graft table at $root does not " +
          s"match the manifest (declared ${declared.toSeq.sorted
            .mkString(", ")} vs manifest ${actual.toSeq.sorted
            .mkString(", ")}) — the manifest wins; run SQL ALTER " +
          "TABLE (or re-create the catalog entry) to re-sync")
    rel
  }

  // ---- streaming source (spark.readStream.format("graft")) ----
  // options: startingVersion (default 0 = full initial snapshot,
  // N > 0 = tail new rows from version N on), ignoreDeletes (a MoR
  // delete mid-stream then streams nothing instead of failing),
  // readChangeFeed (CDF rows tagged _change_type/_commit_version),
  // maxVersionsPerTrigger / maxBytesPerTrigger (backlogs drain as
  // bounded micro-batches; composes with Trigger.AvailableNow),
  // pinOffsets (a stream_<id> branch ref moves with the committed
  // offset; vacuum retains the whole suffix a restart needs)

  private def streamSchema(sqlContext: SQLContext,
      parameters: Map[String, String],
      declared: Option[StructType]): StructType = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val base = declared.getOrElse {
      val spark = sqlContext.sparkSession
      val root = rootOf(parameters)
      VersionedTable.snapshotSchema(spark, root,
        VersionedTable.latestVersion(spark, root).getOrElse(
          sys.error(s"no committed version at $root")))
    }
    if (p.get("readchangefeed").exists(_.toBoolean))
      StructType(base.fields.toIndexedSeq
        :+ org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false)
        :+ org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false))
    else base
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    // validated HERE too: sourceSchema runs eagerly at load() while
    // createSource runs on the stream thread — a bad option combo
    // should fail in the caller's stack, not asynchronously
    require(!(p.contains("startingtimestamp") &&
        p.contains("startingversion")),
      "startingVersion and startingTimestamp are mutually exclusive")
    (shortName(), streamSchema(sqlContext, parameters, schema))
  }

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = rootOf(parameters)
    // startingTimestamp (epoch millis, ISO date, or ISO date-time,
    // UTC): tail from the FIRST commit at or after the instant — the
    // Delta option, resolved against manifest-recorded commit times
    // (never file mtimes). A future timestamp streams new commits
    // only.
    val startingTs = p.get("startingtimestamp").map { s =>
      s.toLongOption.getOrElse {
        val t = scala.util.Try(
            java.time.LocalDateTime.parse(s.replace(' ', 'T')))
          .getOrElse(java.time.LocalDate.parse(s).atStartOfDay())
        t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }
    }
    require(startingTs.isEmpty || !p.contains("startingversion"),
      "startingVersion and startingTimestamp are mutually exclusive")
    val spark0 = sqlContext.sparkSession
    val startingVersion = startingTs match {
      case Some(ts) =>
        val vs = VersionedTable.versions(spark0, root)
        vs.find(v =>
            VersionedTable.commitTimeMs(spark0, root, v) >= ts)
          .getOrElse(vs.lastOption.map(_ + 1).getOrElse(0L))
      case None => p.get("startingversion").map(_.toLong).getOrElse(0L)
    }
    require(startingVersion >= 0,
      s"startingVersion must be >= 0: $startingVersion")
    val ignoreDeletes = p.get("ignoredeletes").exists(_.toBoolean)
    val changeFeed = p.get("readchangefeed").exists(_.toBoolean)
    val maxVersions = p.get("maxversionspertrigger").map(_.toLong)
    maxVersions.foreach(n => require(n > 0,
      s"maxVersionsPerTrigger must be > 0: $n"))
    val maxBytes = p.get("maxbytespertrigger").map(_.toLong)
    maxBytes.foreach(n => require(n > 0,
      s"maxBytesPerTrigger must be > 0: $n"))
    val pinOffsets = p.get("pinoffsets").exists(_.toBoolean)
    new GraftStreamSource(sqlContext, root, startingVersion,
      ignoreDeletes, changeFeed,
      streamSchema(sqlContext, parameters, schema),
      maxVersionsPerTrigger = maxVersions,
      maxBytesPerTrigger = maxBytes,
      pinOffsets = pinOffsets,
      metadataPath = metadataPath)
  }

  private def rootOf(parameters: Map[String, String]): String = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    p.getOrElse("path", sys.error(
      "graft source needs a table root: .load(root) or option(\"path\", root)"))
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = rootOf(parameters)
    val spark = sqlContext.sparkSession
    // an explicit versionAsOf/refAsOf PINS the relation to that
    // snapshot; otherwise the relation tracks the table HEAD at scan
    // time — a `CREATE TABLE ... USING graft` relation is cached by
    // the session catalog across statements, and a head-tracking
    // relation is what makes INSERT-then-SELECT see the insert (a
    // creation-time pin would silently serve stale reads forever)
    val pinned = p.get("versionasof").map(_.toLong)
      .orElse(p.get("refasof")
        .map(r => VersionedTable.resolveRef(spark, root, r)))
    pinned.foreach(v =>
      require(VersionedTable.versions(spark, root).contains(v),
        s"no committed version $v at $root"))
    require(pinned.isDefined ||
      VersionedTable.latestVersion(spark, root).isDefined,
      s"no committed version at $root")
    GraftRelation(sqlContext, root, pinned)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = rootOf(parameters)
    val spark = sqlContext.sparkSession
    val tag = p.getOrElse("tag", "")
    val exists = VersionedTable.latestVersion(spark, root).isDefined
    mode match {
      case SaveMode.Overwrite => VersionedTable.commit(data, root, tag)
      case SaveMode.Append =>
        if (exists) VersionedTable.commitAppend(data, root, tag)
        else VersionedTable.commit(data, root, tag)
      case SaveMode.ErrorIfExists =>
        require(!exists, s"graft table already exists at $root " +
          "(SaveMode.ErrorIfExists)")
        VersionedTable.commit(data, root, tag)
      case SaveMode.Ignore =>
        if (!exists) VersionedTable.commit(data, root, tag)
    }
    createRelation(sqlContext, parameters)
  }
}

/** One committed snapshot as a Spark relation — see
  * [[GraftDataSource]] for the planning contract.
  */
case class GraftRelation(sqlContext: SQLContext, root: String,
    pinnedVersion: Option[Long]) extends BaseRelation
    with PrunedFilteredScan with InsertableRelation
    with org.apache.spark.internal.Logging {

  private def spark = sqlContext.sparkSession

  /** The snapshot a SCAN binds to: the pinned version for
    * versionAsOf/refAsOf relations, the CURRENT head otherwise —
    * resolved per call, because the session catalog caches this
    * relation across statements and a table read must see the data
    * its own preceding INSERT committed. Caveat (documented, the V1
    * price of head-tracking without catalog invalidation hooks): two
    * scans of the same head-tracking relation inside ONE statement
    * can bind different snapshots if a writer commits between them;
    * pin with versionAsOf for repeatable multi-scan reads.
    */
  private def version: Long = pinnedVersion.getOrElse(
    VersionedTable.latestVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root")))

  /** `INSERT INTO` / `INSERT OVERWRITE` on a catalog table created
    * with `USING graft` — the V1 insert contract: append drives the
    * manifest-last fast append, overwrite the copy-on-write rewrite.
    * Inserts land on the table HEAD (the newest version), never on
    * this relation's pinned snapshot — inserting "into the past"
    * through a versionAsOf relation would silently fork history.
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    if (overwrite) VersionedTable.commit(data, root, tag = "sql-insert")
    else VersionedTable.commitAppendRetry(data, root,
      tag = "sql-insert")
    ()
  }

  // V1 filters and required-column lists carry BARE attribute names:
  // a column literally named "a.b" must quote, or col() would parse
  // a struct access (the standard V1 connector escaping)
  private def attr(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  // metadata-sized: the manifest field mapping (or one footer of the
  // last data dir), never the full scoped read plan readVersion
  // assembles. A DEF, not a creation-time val: a head-tracking
  // relation cached by the catalog must declare the types the
  // scan-time head actually emits (a post-widen INT declaration over
  // LONG InternalRows with needConversion=false would be type
  // corruption, not an error). The (version, schema) pair LATCHES so
  // buildScan can detect a schema-changing commit landing between
  // this statement's analysis and its execution (round-13 advice) —
  // see the drift check there.
  @volatile private var latched: Option[(Long, StructType)] = None
  override def schema: StructType = {
    val v = version
    latched match {
      case Some((cv, s)) if cv == v => s
      case _ =>
        val s = VersionedTable.snapshotSchema(spark, root, v)
        latched = Some((v, s))
        s
    }
  }

  // BaseRelation's default is spark.sql.defaultSizeInBytes
  // (Long.MaxValue): any SQL join against a graft table would treat
  // it as infinite and never broadcast it. The manifest-listed
  // parquet byte sum is the honest, metadata-sized answer (if
  // anything conservative: MoR deletes only shrink the live rows).
  // Catalyst consults relation stats several times while planning
  // one statement — memoize per resolved version so a many-directory
  // table pays one listing per snapshot, not one per consultation.
  @volatile private var sizeCache: Option[(Long, Long)] = None
  override def sizeInBytes: Long = {
    val v = version
    sizeCache match {
      case Some((cv, bytes)) if cv == v => bytes
      case _ =>
        val bytes = VersionedTable.dataBytes(spark, root, v)
        sizeCache = Some((v, bytes))
        bytes
    }
  }

  // buildScan returns the inner plan's InternalRow RDD directly —
  // the documented V1 contract when needConversion is false
  override def needConversion: Boolean = false

  // every filter is ALSO evaluated by Spark above this relation:
  // the translation below only ever prunes files/rows that provably
  // cannot match, so reporting all filters unhandled costs one
  // cheap re-check per row and removes the translation from the
  // correctness trust base entirely
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  /** Exact-or-skip translation of a V1 Filter to a Column predicate.
    * None = untranslatable: the conjunct drops out of the pushed
    * predicate (wider scan — safe, Spark re-applies it). AND may
    * keep one translatable side (wider); OR/NOT must translate
    * exactly or not at all (partial OR/NOT would NARROW the scan).
    */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(attr(a) === lit(v))
    case EqualNullSafe(a, v) => Some(attr(a) <=> lit(v))
    case GreaterThan(a, v) => Some(attr(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(attr(a) >= lit(v))
    case LessThan(a, v) => Some(attr(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(attr(a) <= lit(v))
    case In(a, vs) if vs.nonEmpty => Some(attr(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(attr(a).isNull)
    case IsNotNull(a) => Some(attr(a).isNotNull)
    case StringStartsWith(a, p) => Some(attr(a).startsWith(p))
    case StringEndsWith(a, p) => Some(attr(a).endsWith(p))
    case StringContains(a, p) => Some(attr(a).contains(p))
    case And(l, r) => (toColumn(l), toColumn(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, other) => one.orElse(other) // partial AND = wider
    }
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) }
      yield a || b
    case Not(c) => exactColumn(c).map(!_)
    case _ => None
  }

  /** Like [[toColumn]] but refuses the partial-AND widening — the
    * form NOT requires (NOT of a widened predicate would narrow).
    */
  private def exactColumn(f: Filter): Option[Column] = f match {
    case And(l, r) => for { a <- exactColumn(l); b <- exactColumn(r) }
      yield a && b
    case Or(l, r) => for { a <- exactColumn(l); b <- exactColumn(r) }
      yield a || b
    case Not(c) => exactColumn(c).map(!_)
    case other => toColumn(other)
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    // head-tracking drift check: a commit landing between this
    // statement's analysis and its execution moves `version`, and
    // with needConversion=false a scan whose snapshot SCHEMA differs
    // from the one the relation declared would hand Spark
    // InternalRows of the wrong physical types — silent corruption,
    // not an error. When the head's schema still matches the declared
    // one (the overwhelmingly common case: plain appends/deletes;
    // compared nullability-insensitively, since footers from
    // different writers legitimately disagree on nullable), the scan
    // binds the head. On TRUE drift it FAILS LOUDLY: a session
    // catalog or temp view caches this relation indefinitely, so
    // silently pinning the analysis snapshot would hide every
    // post-evolution row forever — a clear retry/refresh instruction
    // beats both corruption and invisible staleness.
    def shape(s: StructType) =
      s.fields.toIndexedSeq.map(f =>
        (f.name.toLowerCase, f.dataType.simpleString))
    val head = version
    latched match {
      case Some((lv, ls)) if lv != head &&
          shape(VersionedTable.snapshotSchema(spark, root, head)) !=
            shape(ls) =>
        throw new IllegalStateException(
          s"graft table $root changed schema between analysis " +
            s"(v$lv) and execution (v$head): re-run the query, " +
            "REFRESH TABLE / re-create the view, or pin with " +
            "versionAsOf for repeatable reads")
      case _ => ()
    }
    val bound = head
    val pred = filters.flatMap(toColumn(_)).reduceOption(_ && _)
    val base = pred match {
      case Some(p) =>
        VersionedTable.readWhereVersion(spark, root, bound, p)
      case None => VersionedTable.readVersion(spark, root, bound)
    }
    // column pruning: the projection lands inside the inner plan, so
    // Catalyst narrows the parquet ReadSchema as usual; an empty
    // projection (COUNT(*)) selects no columns, rows stay countable
    val projected = base.select(requiredColumns.toIndexedSeq.map(attr): _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
