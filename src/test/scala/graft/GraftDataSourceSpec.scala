package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The SQL surface of the versioned table layer: format("graft")
  * reads (latest / versionAsOf / refAsOf) must agree with the engine
  * API byte-for-byte, the full semantic stack (MoR deletes, schema
  * evolution, clones) must survive the trip through temp views and
  * spark.sql, pushed-filter translation must never change an answer
  * (it is only ever a widener), and the write path must drive the
  * manifest-last commit protocol under every SaveMode.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"${graft.config.Scratch.runDir}/dsspec_$name"
    VersionedTable.destroy(spark, root)
    root
  }

  test("format(\"graft\") resolves by short name and reads the " +
      "latest snapshot; versionAsOf and refAsOf time-travel") {
    val root = freshRoot("read")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedTable.createRef(spark, root, "pinned", 0L)
    VersionedTable.commit(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(spark.read.format("graft").load(root)) ==
      Set((2L, "b"), (3L, "c")))
    assert(rows(spark.read.format("graft")
      .option("versionAsOf", "0").load(root)) == Set((1L, "a")))
    assert(rows(spark.read.format("graft")
      .option("refAsOf", "pinned").load(root)) == Set((1L, "a")))
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", "9").load(root)
    }
  }

  test("the full semantic stack survives SQL: MoR delete + rename + " +
      "append read through a temp view with filters and aggregates") {
    val root = freshRoot("sql")
    VersionedTable.commit(
      (0L until 100L).map(k => (k, k % 7)).toDF("k", "v"), root)
    VersionedTable.deleteKeysMor(spark, root,
      (0L until 100L by 10L).toDF("k"))
    VersionedTable.renameColumn(spark, root, "v", "grp")
    VersionedTable.commitAppend(
      Seq((200L, 3L)).toDF("k", "grp"), root)
    spark.read.format("graft").load(root)
      .createOrReplaceTempView("graft_sql_t")
    val got = spark.sql(
      """SELECT grp, COUNT(*) AS n FROM graft_sql_t
         WHERE k >= 10 AND k <= 300 GROUP BY grp ORDER BY grp""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // model: keys 10..99 minus multiples of 10, plus 200
    val model = ((10L until 100L).filterNot(_ % 10 == 0)
      .map(k => k % 7) :+ 3L)
      .groupBy(identity).toSeq.map { case (g, xs) => (g, xs.size.toLong) }
      .sortBy(_._1)
    assert(got == model)
  }

  test("pushed-filter translation never changes an answer: OR / NOT " +
      "/ IN / startsWith / null checks through the source equal the " +
      "same predicates on the engine read; COUNT(*) plans (empty " +
      "projection)") {
    val root = freshRoot("filters")
    val df = (0L until 500L)
      .map(k => (k, if (k % 11 == 0) null else s"name_$k", k % 13))
      .toDF("k", "name", "v")
    VersionedTable.commitWithStats(
      df.repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      root, statsCols = Seq("k"))
    val src = spark.read.format("graft").load(root)
    val eng = VersionedTable.read(spark, root)
    val preds = Seq(
      col("k") > 100L && col("k") <= 200L,
      col("k") === 42L || col("v") === 7L,
      !(col("v") === 3L),
      col("k").isin(5L, 50L, 500L),
      col("name").startsWith("name_1") && col("k") < 150L,
      col("name").isNull,
      col("name").isNotNull && col("k").between(90L, 110L))
    for (p <- preds) {
      val a = src.where(p).collect().map(_.toString).sorted.toSeq
      val b = eng.where(p).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"source diverged for $p")
    }
    assert(src.count() == 500L)
    assert(spark.read.format("graft").load(root)
      .where(col("k") < 10L).count() == 10L)
  }

  test("write path drives the commit protocol: ErrorIfExists, " +
      "Overwrite, Append (fast append), Ignore, and the tag option") {
    val root = freshRoot("write")
    Seq((1L, "a")).toDF("k", "v").write.format("graft")
      .mode(SaveMode.ErrorIfExists).option("tag", "first").save(root)
    assert(VersionedTable.latestTag(spark, root).contains("first"))
    intercept[Exception] {
      Seq((9L, "x")).toDF("k", "v").write.format("graft")
        .mode(SaveMode.ErrorIfExists).save(root)
    }
    Seq((2L, "b")).toDF("k", "v").write.format("graft")
      .mode(SaveMode.Append).save(root)
    assert(spark.read.format("graft").load(root).count() == 2L)
    // the append was a FAST append: two dirs in the snapshot
    assert(VersionedTable.resolveDirs(spark, root,
      VersionedTable.latestVersion(spark, root).get).size == 2)
    Seq((7L, "z")).toDF("k", "v").write.format("graft")
      .mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("graft").load(root)
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    Seq((8L, "q")).toDF("k", "v").write.format("graft")
      .mode(SaveMode.Ignore).save(root)
    assert(spark.read.format("graft").load(root)
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // history: every mode that wrote shows as one committed version
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L, 2L))
  }

  test("sizeInBytes is the manifest-listed byte sum, so a small graft " +
      "table BROADCASTS in a SQL join instead of defaulting to " +
      "infinitely-large (Long.MaxValue forces sort-merge)") {
    val root = freshRoot("size")
    VersionedTable.commit(
      Seq((1L, "us"), (2L, "eu"), (3L, "ap")).toDF("id", "region"),
      root)
    val rel = spark.read.format("graft").load(root)
    // honest, metadata-sized estimate: the actual parquet bytes
    val expect = VersionedTable.dataBytes(spark, root, 0L)
    assert(expect > 0L)
    assert(rel.queryExecution.optimizedPlan.stats.sizeInBytes ==
      BigInt(expect))
    // the dim side of a SQL join auto-broadcasts under the default
    // 10 MB threshold — the plan the engine's API path would pick
    rel.createOrReplaceTempView("graft_dim")
    spark.range(0L, 10000L)
      .select((col("id") % 3 + 1).as("id"), col("id").as("x"))
      .createOrReplaceTempView("size_fact")
    val joined = spark.sql(
      """SELECT g.region, COUNT(*) AS n FROM size_fact f
        |JOIN graft_dim g ON f.id = g.id GROUP BY g.region""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join, got:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum == 10000L)
  }

  test("SQL DDL parity: CREATE TABLE USING graft, INSERT INTO / " +
      "INSERT OVERWRITE, and MERGE INTO drive the manifest-last " +
      "protocol; unsupported merge shapes fail loudly") {
    val root = freshRoot("ddl")
    VersionedTable.commit(
      Seq((1L, 10.0, "O"), (2L, 20.0, "O"), (3L, 30.0, "F"))
        .toDF("k", "price", "status"), root)
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    spark.sql(
      s"CREATE TABLE graft_ddl_t USING graft OPTIONS (path '$root')")
    // catalog read resolves through the relation provider
    assert(spark.sql("SELECT COUNT(*) FROM graft_ddl_t")
      .head().getLong(0) == 3L)
    // INSERT INTO = fast append (a new version, no rewrite)
    spark.sql("INSERT INTO graft_ddl_t VALUES (4, 40.0, 'O')")
    assert(VersionedTable.latestVersion(spark, root).contains(1L))
    assert(spark.sql("SELECT COUNT(*) FROM graft_ddl_t")
      .head().getLong(0) == 4L)
    // MERGE INTO: delete-first, update-star, insert-star — the
    // canonical CDC fold, driven entirely through SQL
    Seq((2L, 99.0, "X", "d"), (3L, 33.0, "O", "u"), (9L, 90.0, "O", "i"))
      .toDF("k", "price", "status", "op")
      .createOrReplaceTempView("graft_ddl_src")
    spark.sql(
      """MERGE INTO graft_ddl_t t USING graft_ddl_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'd' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val got = spark.sql(
      "SELECT k, price, status FROM graft_ddl_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq
    assert(got == Seq((1L, 10.0, "O"), (3L, 33.0, "O"),
      (4L, 40.0, "O"), (9L, 90.0, "O")), got)
    // re-running the same merge is idempotent on content
    spark.sql(
      """MERGE INTO graft_ddl_t t USING graft_ddl_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'd' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(spark.sql("SELECT k, price, status FROM graft_ddl_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq == got)
    // INSERT OVERWRITE = copy-on-write rewrite
    spark.sql("INSERT OVERWRITE graft_ddl_t VALUES (7, 70.0, 'O')")
    assert(spark.sql("SELECT COUNT(*) FROM graft_ddl_t")
      .head().getLong(0) == 1L)
    // a shape the engine verb cannot express fails loudly, never
    // silently drifts: per-column UPDATE SET is not SET *
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_ddl_t t USING graft_ddl_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET price = s.price * 2
          |""".stripMargin).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("graft MERGE INTO supports")),
      msgs(e).mkString(" | "))
    spark.sql("DROP TABLE graft_ddl_t")
  }

  test("SQL UPDATE and DELETE statements drive copy-on-write rewrites " +
      "with standard semantics (NULL WHERE keeps the row, assignments " +
      "cast to the column's type, time travel keeps the old snapshot)") {
    val root = freshRoot("dml")
    VersionedTable.commit(
      Seq((1L, 10.0, "O"), (2L, 20.0, "F"), (3L, 30.0, "O"))
        .toDF("k", "price", "status"), root)
    spark.sql("DROP TABLE IF EXISTS graft_dml_t")
    spark.sql(
      s"CREATE TABLE graft_dml_t USING graft OPTIONS (path '$root')")
    spark.sql(
      "UPDATE graft_dml_t SET price = price * 2, status = 'X' " +
        "WHERE k >= 2 AND status = 'O'").collect()
    def rows() = spark.sql(
      "SELECT k, price, status FROM graft_dml_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq
    assert(rows() == Seq((1L, 10.0, "O"), (2L, 20.0, "F"),
      (3L, 60.0, "X")))
    // the INT literal assignment casts to the column's DOUBLE
    spark.sql("UPDATE graft_dml_t SET price = 5 WHERE k = 1").collect()
    assert(rows().head == ((1L, 5.0, "O")))
    spark.sql("DELETE FROM graft_dml_t WHERE status = 'X'").collect()
    assert(rows() == Seq((1L, 5.0, "O"), (2L, 20.0, "F")))
    // time travel: the pre-DML snapshot is intact
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(root).count() == 3L)
    // NULL-evaluating WHERE keeps the row (SQL three-valued logic):
    // nothing matches NULL = 'F', so nothing is deleted
    spark.sql(
      "DELETE FROM graft_dml_t WHERE CAST(NULL AS STRING) = status")
      .collect()
    assert(rows().size == 2)
    spark.sql("DROP TABLE graft_dml_t")
  }

  test("CREATE TABLE with an explicit schema on an empty root commits " +
      "a zero-row v0; INSERT INTO then appends onto it") {
    val root = freshRoot("create")
    spark.sql("DROP TABLE IF EXISTS graft_create_t")
    spark.sql("CREATE TABLE graft_create_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    assert(VersionedTable.latestVersion(spark, root).contains(0L))
    assert(spark.sql("SELECT COUNT(*) FROM graft_create_t")
      .head().getLong(0) == 0L)
    spark.sql("INSERT INTO graft_create_t VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT COUNT(*) FROM graft_create_t")
      .head().getLong(0) == 2L)
    assert(VersionedTable.read(spark, root).schema.fieldNames.toSeq ==
      Seq("k", "v"))
    spark.sql("DROP TABLE graft_create_t")
  }

  test("a shallow clone reads through SQL like any table") {
    val src = freshRoot("clsrc")
    val dst = freshRoot("cldst")
    VersionedTable.commit(Seq((1L, 1L), (2L, 2L)).toDF("k", "v"), src)
    VersionedTable.cloneShallow(spark, src, dst)
    spark.read.format("graft").load(dst)
      .createOrReplaceTempView("graft_clone_t")
    assert(spark.sql("SELECT SUM(v) AS s FROM graft_clone_t")
      .head().getLong(0) == 3L)
  }

  test("CREATE TABLE with an explicit schema on a COMMITTED root " +
      "validates against the manifest: drift fails loudly, a " +
      "matching declaration binds") {
    val root = freshRoot("createchk")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    spark.sql("DROP TABLE IF EXISTS graft_createchk_t")
    // typo'd DDL (wrong column name) must not silently bind to the
    // manifest schema
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_createchk_t (k BIGINT, vv STRING) " +
        s"USING graft OPTIONS (path '$root')")
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    // wrong TYPE fails too
    spark.sql("DROP TABLE IF EXISTS graft_createchk_t")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft_createchk_t (k INT, v STRING) " +
        s"USING graft OPTIONS (path '$root')")
    }
    // the matching declaration works and reads the committed rows
    spark.sql("DROP TABLE IF EXISTS graft_createchk_t")
    spark.sql("CREATE TABLE graft_createchk_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT COUNT(*) FROM graft_createchk_t")
      .head().getLong(0) == 1L)
    spark.sql("DROP TABLE graft_createchk_t")
  }

  test("a schema-changing commit between analysis and execution " +
      "fails the scan loudly (never corrupted head rows, never " +
      "silently-stale cached relations); a fresh read sees the new " +
      "head, and plain appends never trip the check") {
    val root = freshRoot("drift")
    VersionedTable.commit(Seq((1, 10), (2, 20)).toDF("k", "v"), root)
    // analysis latches (v0, int schema) into the relation
    val df = spark.read.format("graft").load(root)
    // ...then the schema widens and a LONG row lands before execution
    VersionedTable.widenColumn(spark, root, "v", "BIGINT")
    VersionedTable.commitAppend(
      Seq((3, 5000000000L)).toDF("k", "v"), root)
    // with needConversion=false, scanning the head under the stale
    // INT declaration would be silent type corruption; and a session
    // catalog / temp view caches this relation forever, so silently
    // pinning the old snapshot would hide the new rows indefinitely —
    // the scan must FAIL with a refresh instruction instead
    val e = intercept[Exception] { df.collect() }
    assert(e.getMessage != null &&
      e.getMessage.contains("changed schema"), e.getMessage)
    // a fresh relation declares the widened schema and sees all rows
    val fresh = spark.read.format("graft").load(root)
    assert(fresh.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(fresh.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      == Set((1, 10L), (2, 20L), (3, 5000000000L)))
    // schema-PRESERVING commits between analysis and execution bind
    // the head as always (head-tracking is the point)
    val again = spark.read.format("graft").load(root)
    VersionedTable.commitAppend(Seq((4, 40L)).toDF("k", "v"), root)
    assert(again.count() == 4L)
  }

  test("SQL ALTER TABLE parity: RENAME / ALTER TYPE / ADD / DROP " +
      "map onto the metadata-only evolution verbs and refresh the " +
      "catalog relation") {
    val root = freshRoot("alter")
    VersionedTable.commit(Seq((1, "a", 10)).toDF("k", "v", "n"), root)
    spark.sql("DROP TABLE IF EXISTS graft_alter_t")
    spark.sql("CREATE TABLE graft_alter_t USING graft " +
      s"OPTIONS (path '$root')")
    spark.sql("ALTER TABLE graft_alter_t RENAME COLUMN v TO label")
    spark.sql("ALTER TABLE graft_alter_t ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE graft_alter_t ADD COLUMN extra DOUBLE")
    spark.sql("INSERT INTO graft_alter_t " +
      "VALUES (2, 'b', 5000000000, 1.5)")
    val got = spark.sql(
      "SELECT k, label, n, extra FROM graft_alter_t ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    // the pre-evolution row reads the added column as NULL and the
    // widened column through the up-cast; the post-ALTER insert
    // carries the long value the INT column could not
    assert(got == Seq((1, "a", 10L, -1.0), (2, "b", 5000000000L, 1.5)),
      got)
    spark.sql("ALTER TABLE graft_alter_t DROP COLUMN extra")
    assert(spark.sql("SELECT * FROM graft_alter_t").columns.toSeq ==
      Seq("k", "label", "n"))
    // IF EXISTS on an absent column no-ops; without it, loud error
    spark.sql("ALTER TABLE graft_alter_t DROP COLUMN IF EXISTS ghost")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_alter_t DROP COLUMN ghost")
    }
    // unsupported shapes fail loudly at parse/execution, never drift
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE graft_alter_t " +
        "ADD COLUMN bad INT NOT NULL")
    }
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE graft_alter_t " +
        "ADD COLUMN bad INT COMMENT 'nope'")
    }
    // a NARROWING type change is the engine verb's own loud error
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_alter_t ALTER COLUMN n TYPE INT")
    }
    spark.sql("DROP TABLE graft_alter_t")
  }

  test("SQL time travel: VERSION AS OF (id and named ref) and " +
      "TIMESTAMP AS OF bind pinned snapshot reads; temp views over " +
      "graft relations time-travel too") {
    val root = freshRoot("tt")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    Thread.sleep(30) // separate the two commits' manifest timestamps
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    VersionedTable.createRef(spark, root, "first", 0L)
    spark.sql("DROP TABLE IF EXISTS graft_tt_t")
    spark.sql(s"CREATE TABLE graft_tt_t USING graft " +
      s"OPTIONS (path '$root')")
    def n(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(n("SELECT COUNT(*) AS n FROM graft_tt_t") == 2L)
    assert(n("SELECT COUNT(*) AS n FROM graft_tt_t VERSION AS OF 0")
      == 1L)
    // a non-numeric version string resolves as a NAMED REF
    assert(n("SELECT COUNT(*) AS n FROM graft_tt_t " +
      "VERSION AS OF 'first'") == 1L)
    // TIMESTAMP AS OF = newest commit at or before the instant
    val t0 = VersionedTable.commitTimeMs(spark, root, 0L)
    val t1 = VersionedTable.commitTimeMs(spark, root, 1L)
    assert(t1 > t0, s"commit times must separate: $t0 vs $t1")
    assert(n(s"SELECT COUNT(*) AS n FROM graft_tt_t " +
      s"TIMESTAMP AS OF $t0") == 1L)
    assert(n(s"SELECT COUNT(*) AS n FROM graft_tt_t " +
      s"TIMESTAMP AS OF $t1") == 2L)
    // a DATE literal carries days-since-epoch, not millis — a
    // far-future date binds the head, never a nonsense 1970 instant
    assert(n("SELECT COUNT(*) AS n FROM graft_tt_t " +
      "TIMESTAMP AS OF DATE '2100-01-01'") == 2L)
    // before the first commit: loud error, not an empty result
    intercept[Exception] {
      spark.sql(s"SELECT COUNT(*) AS n FROM graft_tt_t " +
        s"TIMESTAMP AS OF ${t0 - 1000}").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT COUNT(*) AS n FROM graft_tt_t " +
        "VERSION AS OF 99").collect()
    }
    // temp view over the relation (no catalog table entry)
    spark.read.format("graft").load(root)
      .createOrReplaceTempView("graft_tt_view")
    assert(n("SELECT COUNT(*) AS n FROM graft_tt_view " +
      "VERSION AS OF 0") == 1L)
    spark.sql("DROP TABLE graft_tt_t")
  }

  test("SQL OPTIMIZE and VACUUM statements: bin-pack + MoR-delete " +
      "fold, ZORDER BY form, version-count retention; non-graft " +
      "targets keep the stock ParseException") {
    val root = freshRoot("maint")
    VersionedTable.commit(
      (0L until 60L).map(k => (k, k % 5)).toDF("k", "v").coalesce(2),
      root)
    VersionedTable.commitAppend(
      (60L until 120L).map(k => (k, k % 5)).toDF("k", "v").coalesce(2),
      root)
    VersionedTable.deleteKeysMor(spark, root,
      (0L until 120L by 10L).toDF("k"))
    spark.sql("DROP TABLE IF EXISTS graft_maint_t")
    spark.sql("CREATE TABLE graft_maint_t USING graft " +
      s"OPTIONS (path '$root')")
    val before = spark.sql("SELECT * FROM graft_maint_t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val v = spark.sql("OPTIMIZE graft_maint_t").head().getLong(0)
    // the rewrite folded the sidecar into ONE packed directory and
    // kept the logical content byte-for-byte
    assert(VersionedTable.dataFileCount(spark, root, v) <
      VersionedTable.dataFileCount(spark, root, v - 1))
    assert(spark.sql("SELECT * FROM graft_maint_t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == before)
    // ZORDER BY form re-clusters on the named dimensions
    spark.sql("OPTIMIZE graft_maint_t ZORDER BY (k, v)").collect()
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_maint_t")
      .head().getLong(0) == before.size.toLong)
    // version-count retention; the head always survives
    val kept = spark.sql("VACUUM graft_maint_t RETAIN 1 VERSIONS")
      .head().getLong(0)
    assert(kept == 1L, s"retained $kept")
    assert(spark.sql("SELECT * FROM graft_maint_t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == before)
    // a statement stock Spark cannot parse and we do not own still
    // fails with the stock error
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("OPTIMIZE not_a_graft_table")
    }
    spark.sql("DROP TABLE graft_maint_t")
  }

  test("SQL table_changes TVF and DESCRIBE HISTORY: batch CDF rows " +
      "in commit order, commit audit with data_change flags; unknown " +
      "names keep the stock errors") {
    val root = freshRoot("cdfsql")
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      root, tag = "base")
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("k", "v"), root,
      tag = "delta")
    VersionedTable.deleteKeysMor(spark, root, Seq(2L).toDF("k"),
      tag = "erase")
    spark.sql("DROP TABLE IF EXISTS graft_cdfsql_t")
    spark.sql("CREATE TABLE graft_cdfsql_t USING graft " +
      s"OPTIONS (path '$root')")
    // by catalog name, from = 0 INCLUSIVE (the Delta contract): the
    // initial commit arrives as insert-tagged rows at version 0
    val byName = spark.sql(
      "SELECT k, _change_type, _commit_version " +
        "FROM table_changes('graft_cdfsql_t', 0) " +
        "ORDER BY _commit_version, k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(byName == Seq((1L, "insert", 0L), (2L, "insert", 0L),
      (3L, "insert", 1L), (2L, "delete", 2L)), byName)
    // by raw root path with an explicit to-version; from = 1 keeps
    // its own changes (inclusive) and drops v0's
    val byPath = spark.sql(
      s"SELECT k, _change_type FROM table_changes('$root', 1, 1) " +
        "ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(byPath == Seq((3L, "insert")), byPath)
    // DESCRIBE HISTORY: one row per retained version, audit columns
    spark.sql("OPTIMIZE graft_cdfsql_t").collect()
    val hist = spark.sql("DESCRIBE HISTORY graft_cdfsql_t")
      .select("version", "tag", "data_change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(hist == Seq((0L, "base", true), (1L, "delta", true),
      (2L, "erase", true), (3L, "sql-optimize", false)), hist)
    // commit timestamps are present and monotone nondecreasing
    val ts = spark.sql("DESCRIBE HISTORY graft_cdfsql_t")
      .select("commit_ts_ms").collect().map(_.getLong(0)).toSeq
    assert(ts.forall(_ > 0) && ts == ts.sorted, ts)
    // unknown targets keep stock behavior
    intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('no_such_table', 0)")
        .collect()
    }
    // stock Spark parses DESCRIBE HISTORY t as "describe column t of
    // table HISTORY" — for a non-graft target the stock analysis
    // error (table HISTORY not found) surfaces untouched
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DESCRIBE HISTORY no_such_table").collect()
    }
    spark.sql("DROP TABLE graft_cdfsql_t")
  }

  test("SQL RESTORE TABLE ... TO VERSION AS OF rolls FORWARD: old " +
      "content becomes the newest version, history intact") {
    val root = freshRoot("restore")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    spark.sql("DROP TABLE IF EXISTS graft_restore_t")
    spark.sql("CREATE TABLE graft_restore_t USING graft " +
      s"OPTIONS (path '$root')")
    val v = spark.sql(
      "RESTORE TABLE graft_restore_t TO VERSION AS OF 0")
      .head().getLong(0)
    assert(v == 2L)
    assert(spark.sql("SELECT k FROM graft_restore_t").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // roll-forward, never rewrite: the undone version time-travels
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM graft_restore_t VERSION AS OF 1")
      .head().getLong(0) == 2L)
    // the bare (no TABLE keyword) form works too
    spark.sql("RESTORE graft_restore_t TO VERSION AS OF 1").collect()
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_restore_t")
      .head().getLong(0) == 2L)
    spark.sql("DROP TABLE graft_restore_t")
  }

  test("SQL RESTORE ... TO TIMESTAMP AS OF binds the newest commit " +
      "at or before the instant, resolved at execution time") {
    val root = freshRoot("restorets")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    val t0 = VersionedTable.commitTimeMs(spark, root, 0L)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    spark.sql("DROP TABLE IF EXISTS graft_restorets_t")
    spark.sql("CREATE TABLE graft_restorets_t USING graft " +
      s"OPTIONS (path '$root')")
    // epoch-millis literal pinned exactly at v0's commit instant
    val v = spark.sql("RESTORE TABLE graft_restorets_t " +
      s"TO TIMESTAMP AS OF '$t0'").head().getLong(0)
    assert(v == 2L)
    assert(spark.sql("SELECT k FROM graft_restorets_t").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // an instant before the first commit fails loudly
    intercept[Exception] {
      spark.sql("RESTORE graft_restorets_t TO TIMESTAMP AS OF " +
        s"'${t0 - 100000}'").collect()
    }
    // a date-time literal resolves in the SESSION time zone: far
    // future binds the newest version (idempotent restore-to-self)
    spark.sql("RESTORE graft_restorets_t TO TIMESTAMP AS OF " +
      "'2099-01-01 00:00:00'").collect()
    assert(spark.sql("SELECT k FROM graft_restorets_t").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    spark.sql("DROP TABLE graft_restorets_t")
  }

  test("SQL CREATE TABLE ... SHALLOW CLONE: zero-copy clone via " +
      "catalog name + LOCATION or raw paths; source untouched") {
    val src = freshRoot("clonesql_src")
    val dst = freshRoot("clonesql_dst")
    val dst2 = freshRoot("clonesql_dst2")
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      src, tag = "base")
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("k", "v"), src)
    spark.sql("DROP TABLE IF EXISTS graft_clonesql_src")
    spark.sql("DROP TABLE IF EXISTS graft_clonesql_t")
    spark.sql("CREATE TABLE graft_clonesql_src USING graft " +
      s"OPTIONS (path '$src')")
    // catalog-name target: registered and immediately queryable
    val row = spark.sql("CREATE TABLE graft_clonesql_t SHALLOW CLONE " +
      s"graft_clonesql_src LOCATION '$dst'").head()
    assert(row.getLong(0) == 0L && row.getString(1) == dst)
    assert(spark.sql("SELECT k FROM graft_clonesql_t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // clone-side writes never touch the source
    spark.sql("INSERT INTO graft_clonesql_t VALUES (9, 'z')")
    assert(VersionedTable.read(spark, src).count() == 3L)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_clonesql_t")
      .head().getLong(0) == 4L)
    // raw-path form with a version pin
    spark.sql(s"CREATE TABLE '$dst2' SHALLOW CLONE '$src' " +
      "VERSION AS OF 0").collect()
    assert(VersionedTable.read(spark, dst2).count() == 2L)
    // a non-graft source fails with a clear execution error
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE '${dst2}_x' SHALLOW CLONE not_a_table")
        .collect()
    }
    assert(e.getMessage.contains("not a graft table"), e.getMessage)
    spark.sql("DROP TABLE graft_clonesql_t")
    spark.sql("DROP TABLE graft_clonesql_src")
  }

  test("SQL CTAS: CREATE TABLE ... USING graft AS SELECT commits v0 " +
      "through the manifest-last protocol and round-trips") {
    val root = freshRoot("ctas")
    spark.sql("DROP TABLE IF EXISTS graft_ctas_t")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE graft_ctas_t USING graft " +
      s"OPTIONS (path '$root') AS SELECT * FROM ctas_src WHERE k <> 2")
    assert(spark.sql("SELECT k, v FROM graft_ctas_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (3L, "c")))
    // the CTAS wrote a real manifest: the engine API reads it too,
    // and the lifecycle continues (INSERT appends as v1)
    assert(VersionedTable.latestVersion(spark, root).contains(0L))
    spark.sql("INSERT INTO graft_ctas_t VALUES (4, 'd')")
    assert(VersionedTable.read(spark, root).count() == 3L)
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM graft_ctas_t VERSION AS OF 0")
      .head().getLong(0) == 2L)
    // CTAS onto an already-committed root fails loudly (the stock
    // ErrorIfExists path hits the engine's existence check)
    spark.sql("DROP TABLE graft_ctas_t")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft_ctas_t USING graft " +
        s"OPTIONS (path '$root') AS SELECT * FROM ctas_src")
    }
  }

  test("table_changes parses WITHOUT any I/O or binding: head " +
      "resolution happens at analysis, so parse-then-execute-later " +
      "binds the head THEN") {
    // parsing must succeed even for a nonexistent target — the thin
    // parser only captures literals; binding errors are ANALYSIS
    // errors (stock behavior restored for unknown names)
    val parsed = spark.sessionState.sqlParser.parsePlan(
      "SELECT * FROM table_changes('definitely_no_such_table', 0)")
    assert(parsed.collectFirst {
      case u: org.apache.spark.sql.graft.UnresolvedTableChanges => u
    }.isDefined, parsed)
    // a statement parsed BEFORE a commit sees the commit when it
    // finally analyzes/executes — the head is not frozen at parse
    val root = freshRoot("cdflate")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root,
      tag = "base")
    val plan = spark.sessionState.sqlParser.parsePlan(
      s"SELECT COUNT(*) AS n FROM table_changes('$root', 0)")
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    val n = org.apache.spark.sql.graft.ColumnBridge
      .ofRows(spark, plan).head().getLong(0)
    assert(n == 2L, s"late-bound table_changes saw $n rows")
  }

  test("backquoted identifiers containing dots resolve in " +
      "maintenance statements (OPTIMIZE `a.b`)") {
    val root = freshRoot("dotted")
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      root)
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("k", "v"), root)
    // the session catalog forbids dots in PERSISTENT table names, but
    // a temp view over a graft relation is the other resolution path
    // and allows them — exactly where the old manual '.' split broke
    spark.read.format("graft").load(root)
      .createOrReplaceTempView("`weird.name`")
    // the identifier must parse as ONE part through the delegate's
    // multipart grammar — a manual '.' split mis-resolved it and
    // re-raised the stock ParseException
    val v = spark.sql("OPTIMIZE `weird.name`").head().getLong(0)
    assert(v == 2L, s"OPTIMIZE committed version $v")
    assert(VersionedTable.read(spark, root).count() == 3L)
    spark.catalog.dropTempView("weird.name")
    ()
  }

  test("SQL VACUUM ... RETAIN n HOURS expires by commit age (head " +
      "always survives); DESCRIBE DETAIL reports the table audit row") {
    val root = freshRoot("vachours")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    val t1 = VersionedTable.commitTimeMs(spark, root, 1L)
    // ms-fence: both commits must be strictly older than "now"
    while (System.currentTimeMillis() <= t1) Thread.sleep(1)
    spark.sql("DROP TABLE IF EXISTS graft_vachours_t")
    spark.sql("CREATE TABLE graft_vachours_t USING graft " +
      s"OPTIONS (path '$root')")
    // a 48h horizon keeps everything
    assert(spark.sql("VACUUM graft_vachours_t RETAIN 48 HOURS")
      .head().getLong(0) == 2L)
    // DESCRIBE DETAIL: the audit row
    val d = spark.sql("DESCRIBE DETAIL graft_vachours_t").head()
    // the catalog may return the location as a qualified URI
    assert(d.getString(0) == "graft" && d.getString(1).endsWith(root))
    assert(d.getLong(2) == 1L && d.getLong(3) > 0L &&
      d.getLong(4) > 0L && d.getLong(5) == 2L, d)
    // a zero-hour horizon expires everything but the head
    assert(spark.sql("VACUUM graft_vachours_t RETAIN 0 HOURS")
      .head().getLong(0) == 1L)
    assert(VersionedTable.versions(spark, root) == Seq(1L))
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_vachours_t")
      .head().getLong(0) == 2L)
    // a non-graft DESCRIBE DETAIL target keeps the stock error
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DESCRIBE DETAIL no_such_table").collect()
    }
    spark.sql("DROP TABLE graft_vachours_t")
  }

  test("CONVERT TO GRAFT imports a parquet dir zero-copy: no bytes " +
      "under the root, lifecycle continues, MoR deletes scope over " +
      "the import, vacuum never touches the source") {
    val srcDir = s"${graft.config.Scratch.runDir}/dsspec_convsrc"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(srcDir)
    val root = freshRoot("convert")
    spark.sql("DROP TABLE IF EXISTS graft_convert_t")
    val row = spark.sql(s"CONVERT TO GRAFT parquet.`$srcDir` " +
      s"LOCATION '$root' AS graft_convert_t").head()
    assert(row.getLong(0) == 0L && row.getString(1) == root)
    assert(spark.sql("SELECT k FROM graft_convert_t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // ZERO-copy: the root holds only the manifest, no data bytes
    assert(VersionedTable.fsListRootNames(spark, root)
      .forall(n => !n.endsWith(".parquet") && !n.startsWith("v0")),
      VersionedTable.fsListRootNames(spark, root))
    // lifecycle continues: append + MoR delete of an IMPORTED row
    // (the import's seq-0 directory scopes under the delete's seq 1)
    spark.sql("INSERT INTO graft_convert_t VALUES (4, 'd')")
    VersionedTable.deleteKeysMor(spark, root, Seq(2L).toDF("k"))
    assert(spark.sql("SELECT k FROM graft_convert_t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    // vacuum structurally cannot reclaim the external source
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(spark.read.parquet(srcDir).count() == 3L)
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_convert_t")
      .head().getLong(0) == 3L)
    // a nested/partitioned source fails loudly
    val partDir = s"${graft.config.Scratch.runDir}/dsspec_convpart"
    Seq((1L, "x", "a"), (2L, "y", "b")).toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(partDir)
    val e = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT '$partDir' " +
        s"LOCATION '${root}_p'").collect()
    }
    assert(e.getMessage.contains("unsupported"), e.getMessage)
    spark.sql("DROP TABLE graft_convert_t")
  }

  test("SQL CREATE OR REPLACE TABLE ... AS SELECT commits a NEW " +
      "version over the root; plain REPLACE requires existence") {
    val root = freshRoot("rtas")
    spark.sql("DROP TABLE IF EXISTS graft_rtas_t")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("rtas_src")
    // plain REPLACE on nothing fails loudly
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE graft_rtas_t USING graft " +
        s"OPTIONS (path '$root') AS SELECT * FROM rtas_src")
    }
    assert(e.getMessage.contains("CREATE OR REPLACE"), e.getMessage)
    // OR CREATE creates (v0) …
    spark.sql("CREATE OR REPLACE TABLE graft_rtas_t USING graft " +
      s"OPTIONS (path '$root') AS SELECT * FROM rtas_src")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_rtas_t")
      .head().getLong(0) == 3L)
    // … and replaces (v1, different schema), catalog re-synced
    spark.sql("CREATE OR REPLACE TABLE graft_rtas_t USING graft " +
      s"OPTIONS (path '$root') " +
      "AS SELECT k, v AS label, k * 10 AS score FROM rtas_src " +
      "WHERE k <> 2")
    val rows = spark.sql(
      "SELECT k, label, score FROM graft_rtas_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a", 10L), (3L, "c", 30L)), rows)
    // replace is a VERSIONED commit: the replaced content time-travels
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM graft_rtas_t VERSION AS OF 0")
      .head().getLong(0) == 3L)
    spark.sql("DROP TABLE graft_rtas_t")
  }

  test("SQL VACUUM ... DRY RUN lists exactly what the real sweep " +
      "removes, and removes nothing itself") {
    val root = freshRoot("vacdry")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    VersionedTable.commit(Seq((9L, "z")).toDF("k", "v"), root)
    spark.sql("DROP TABLE IF EXISTS graft_vacdry_t")
    spark.sql("CREATE TABLE graft_vacdry_t USING graft " +
      s"OPTIONS (path '$root')")
    val planned = spark.sql(
      "VACUUM graft_vacdry_t RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0)).toSet
    assert(planned.nonEmpty)
    // nothing was removed: every version still reads
    assert(VersionedTable.versions(spark, root) == Seq(0L, 1L, 2L))
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM graft_vacdry_t VERSION AS OF 1")
      .head().getLong(0) == 2L)
    val before = VersionedTable.fsListRootNames(spark, root)
    spark.sql("VACUUM graft_vacdry_t RETAIN 1 VERSIONS").collect()
    val after = VersionedTable.fsListRootNames(spark, root)
    // the real sweep removed exactly the dry run's plan
    assert(before -- after == planned, (before -- after, planned))
    assert(VersionedTable.versions(spark, root) == Seq(2L))
    spark.sql("DROP TABLE graft_vacdry_t")
  }

  test("table_changes(t, 0) after DROP + re-ADD of a column " +
      "null-fills the re-added column for v0 rows (new field id — " +
      "never the dropped column's values)") {
    val root = freshRoot("cdfreadd")
    VersionedTable.commit(Seq((1L, "old1"), (2L, "old2"))
      .toDF("k", "v"), root, tag = "base")
    spark.sql("DROP TABLE IF EXISTS graft_cdfreadd_t")
    spark.sql("CREATE TABLE graft_cdfreadd_t USING graft " +
      s"OPTIONS (path '$root')")
    spark.sql("ALTER TABLE graft_cdfreadd_t DROP COLUMN v")
    spark.sql("ALTER TABLE graft_cdfreadd_t ADD COLUMN v STRING")
    spark.sql("INSERT INTO graft_cdfreadd_t VALUES (3, 'new3')")
    val rows = spark.sql(
      "SELECT k, v, _commit_version " +
        "FROM table_changes('graft_cdfreadd_t', 0) " +
        "ORDER BY _commit_version, k").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2))).toSeq
    // the re-added v is a NEW field id: v0 rows must read NULL, the
    // dropped column's values must never leak into it
    assert(rows == Seq((1L, null, 0L), (2L, null, 0L),
      (3L, "new3", 3L)), rows)
    spark.sql("DROP TABLE graft_cdfreadd_t")
  }

  test("CREATE OR REPLACE onto a name bound to a DIFFERENT root " +
      "fails loudly BEFORE committing anywhere") {
    val rootA = freshRoot("rtas_a")
    val rootB = freshRoot("rtas_b")
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), rootA)
    spark.sql("DROP TABLE IF EXISTS graft_rtasbind_t")
    spark.sql("CREATE TABLE graft_rtasbind_t USING graft " +
      s"OPTIONS (path '$rootA')")
    Seq((9L, "z")).toDF("k", "v").createOrReplaceTempView("rtasb_src")
    val e = intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE graft_rtasbind_t " +
        s"USING graft OPTIONS (path '$rootB') " +
        "AS SELECT * FROM rtasb_src")
    }
    assert(e.getMessage.contains("bound to"), e.getMessage)
    // fail-BEFORE-commit: neither root advanced/was created
    assert(VersionedTable.latestVersion(spark, rootB).isEmpty)
    assert(VersionedTable.versions(spark, rootA) == Seq(0L))
    spark.sql("DROP TABLE graft_rtasbind_t")
  }

  test("table_changes(t, 0) after RENAME COLUMN carries v0 values " +
      "under the head logical name (never null-filled)") {
    val root = freshRoot("cdfrename")
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      root, tag = "base")
    spark.sql("DROP TABLE IF EXISTS graft_cdfrename_t")
    spark.sql("CREATE TABLE graft_cdfrename_t USING graft " +
      s"OPTIONS (path '$root')")
    spark.sql(
      "ALTER TABLE graft_cdfrename_t RENAME COLUMN v TO label")
    spark.sql("INSERT INTO graft_cdfrename_t VALUES (3, 'c')")
    val rows = spark.sql(
      "SELECT k, label, _change_type, _commit_version " +
        "FROM table_changes('graft_cdfrename_t', 0) " +
        "ORDER BY _commit_version, k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // v0's values arrive under the RENAMED name — the v0 slice reads
    // through the head manifest's field mapping, not v0-local names
    assert(rows == Seq((1L, "a", "insert", 0L),
      (2L, "b", "insert", 0L), (3L, "c", "insert", 2L)), rows)
    spark.sql("DROP TABLE graft_cdfrename_t")
  }
}
