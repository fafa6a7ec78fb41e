package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable

/** Partition-scoped OPTIMIZE (`compactWhere` / `OPTIMIZE t WHERE …`,
  * VERDICT r15 #8): the 100 TB maintenance contract is that a scoped
  * rewrite touches ONLY the directories whose sidecar stats admit the
  * predicate — cold files keep their exact bytes (names, lengths,
  * mtimes), content is preserved verbatim, deletes fold for rewritten
  * rows while still scoping onto carried ones, and data skipping
  * survives on both sides of the rewrite.
  */
class CompactWhereSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"${graft.config.Scratch.runDir}/cwspec_$name"
    VersionedTable.destroy(spark, root)
    root
  }

  /** (name, length) of every parquet file under root/sub. */
  private def files(root: String, sub: String): Set[(String, Long)] = {
    val d = new java.io.File(s"$root/$sub")
    d.listFiles().filter(f => f.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length())).toSet
  }

  /** Cold half 1..1000 as a range-clustered stats commit (3 files),
    * hot half 1001..2000 as three stats-carrying appends. Returns the
    * root; head version is 3.
    */
  private def build(name: String): String = {
    val root = freshRoot(name)
    val cold = spark.range(1, 1001).toDF("k")
      .withColumn("v", col("k") * 10)
    VersionedTable.commitWithStats(
      cold.repartitionByRange(3, col("k")).sortWithinPartitions("k"),
      root, Seq("k"), tag = "cold")
    for (i <- 0 until 3) {
      val hi = if (i == 2) 2001L else (1001 + (i + 1) * 333).toLong
      val hot = spark.range(1001 + i * 333, hi).toDF("k")
        .withColumn("v", col("k") * 10)
      VersionedTable.commitAppendWithStats(hot, root, Seq("k"),
        tag = s"hot$i")
    }
    root
  }

  test("scoped rewrite: hot appends compact into one directory, the " +
      "cold directory's bytes are untouched, content and skipping " +
      "survive") {
    val root = build("scoped")
    val coldBefore = files(root, "v0")
    val v = VersionedTable.compactWhere(spark, root,
      col("k") >= 1001)
    assert(v == 4L)
    // the cold directory carried VERBATIM — same names, same bytes
    assert(files(root, "v0") == coldBefore,
      "scoped rewrite touched cold files")
    // manifest: exactly the carried cold dir + one rewritten dir
    val dirs = VersionedTable.resolveDirs(spark, root, v)
    assert(dirs.length == 2 && dirs.head == "v0", dirs)
    assert(dirs(1).startsWith("a"), dirs)
    // content-preserving (the predicate scopes files, never rows)
    assert(VersionedTable.read(spark, root).count() == 2000L)
    assert(VersionedTable.read(spark, root)
      .agg(sum("k")).head.getLong(0) == 2001L * 2000L / 2)
    // skipping survives on BOTH sides: a cold needle opens no
    // rewritten file, a hot needle opens no cold file
    val coldPruned = VersionedTable.prunedPaths(spark, root, v,
      Seq(("k", 5.0, 10.0)))
    assert(coldPruned.nonEmpty &&
      coldPruned.forall(_.contains("/v0/")), coldPruned)
    val hotPruned = VersionedTable.prunedPaths(spark, root, v,
      Seq(("k", 1500.0, 1510.0)))
    assert(hotPruned.nonEmpty &&
      hotPruned.forall(p => !p.contains("/v0/")), hotPruned)
  }

  test("no-op: a predicate the stats provably exclude publishes " +
      "nothing and returns the current version") {
    val root = build("noop")
    val v = VersionedTable.compactWhere(spark, root,
      col("k") >= 99999)
    assert(v == 3L)
    assert(VersionedTable.latestVersion(spark, root).contains(3L))
  }

  test("deletes: a hot-side MoR delete folds into the rewrite, a " +
      "cold-side one keeps applying through the carried sidecar") {
    val root = build("deletes")
    VersionedTable.deleteKeysMor(spark, root,
      Seq(500L, 1500L).toDF("k"), tag = "erase")
    val v = VersionedTable.compactWhere(spark, root,
      col("k") >= 1001)
    assert(v == 5L)
    val keys = VersionedTable.read(spark, root)
      .select("k").as[Long].collect().toSet
    assert(keys.size == 1998 && !keys.contains(500L) &&
      !keys.contains(1500L))
    // the fold is physical on the hot side: no rewritten row carries
    // the erased key even when the carried delete set is ignored
    val dirs = VersionedTable.resolveDirs(spark, root, v)
    val rewritten = spark.read.parquet(s"$root/${dirs(1)}")
    assert(rewritten.where(col("k") === 1500L).count() == 0L)
  }

  test("SQL surface: OPTIMIZE … WHERE rewrites scoped, reports the " +
      "no-op, and refuses to combine with ZORDER BY") {
    val root = build("sql")
    val t = "cwspec_sql_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$root')")
    try {
      val coldBefore = files(root, "v0")
      val r1 = spark.sql(s"OPTIMIZE $t WHERE k >= 1001").collect()
      assert(r1.head.getLong(0) == 4L && r1.head.getBoolean(1), r1.toSeq)
      assert(files(root, "v0") == coldBefore)
      val r2 = spark.sql(s"OPTIMIZE $t WHERE k >= 99999").collect()
      assert(r2.head.getLong(0) == 4L && !r2.head.getBoolean(1),
        r2.toSeq)
      assert(spark.table(t).count() == 2000L)
      val e = intercept[Exception] {
        spark.sql(s"OPTIMIZE $t ZORDER BY (k, v) WHERE k >= 1001")
          .collect()
      }
      assert(e.getMessage.contains("ZORDER"), e.getMessage)
      // the natural trailing order reaches the same dedicated error
      val e2 = intercept[Exception] {
        spark.sql(s"OPTIMIZE $t WHERE k >= 1001 ZORDER BY (k)")
          .collect()
      }
      assert(e2.getMessage.contains("ZORDER"), e2.getMessage)
      // ADVICE r17: REPEATED trailing clauses all strip — the split
      // iterates, so the residual predicate is clean (`k >= 1001`,
      // no ZORDER text) and the statement reaches the same dedicated
      // cannot-combine error instead of a confusing half-split state
      val e3 = intercept[Exception] {
        spark.sql(s"OPTIMIZE $t WHERE k >= 1001 ZORDER BY (k) " +
          "ZORDER BY (v)").collect()
      }
      assert(e3.getMessage.contains("ZORDER"), e3.getMessage)
      // and a ZORDER-looking literal UNDER a real trailing clause
      // still strips only the real one (quote-parity per iteration)
      val e4 = intercept[Exception] {
        spark.sql(s"OPTIMIZE $t WHERE cast(k as string) != " +
          "'zorder by (x)' ZORDER BY (k)").collect()
      }
      assert(e4.getMessage.contains("ZORDER"), e4.getMessage)
      // ADVICE r16: 'zorder by (…)' TEXT inside a WHERE literal is a
      // legitimate scoped OPTIMIZE, never the cannot-combine error —
      // the unsupported string conjunct widens to TRUE and the k
      // bound excludes everything, so it reports the no-op
      val r3 = spark.sql(s"OPTIMIZE $t WHERE k >= 99999 AND " +
        "cast(k as string) != 'x zorder by (k)'").collect()
      assert(!r3.head.getBoolean(1), r3.toSeq)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("temporal predicate: OPTIMIZE WHERE over a TIMESTAMP literal " +
      "scopes onto the time-clustered tail — the event-log compaction " +
      "shape at 100 TB") {
    // days 1..10 as one clustered stats commit, days 11..12 as two
    // appends; WHERE ts >= day 11 must carry the cold dir. The
    // timestamp literal travels catalyst -> fromCatalyst -> lit ->
    // PredicateBounds.temporalVal onto the epoch-seconds stats scale.
    val root = freshRoot("temporal")
    // Instant -> TimestampType: the numeric stats sidecar casts to
    // double (epoch seconds), which TIMESTAMP supports and
    // TIMESTAMP_NTZ does not — same reason EventsSource normalizes
    // the events table's ts before stats commits
    def day(d: Int) = java.time.LocalDateTime.of(2024, 1, d, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC)
    val cold = spark.range(0, 1000).toDF("i")
      .withColumn("ts", expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0," +
          "CAST(i / 5 AS INT),0,0)"))
      .withColumn("v", col("i") * 2)
    // i/5 hours => 1000 rows span ~8.3 days inside days 1..9
    VersionedTable.commitWithStats(
      cold.repartitionByRange(3, col("ts")).sortWithinPartitions("ts"),
      root, Seq("ts"), tag = "cold")
    for (d <- 11 to 12)
      VersionedTable.commitAppendWithStats(
        spark.range(0, 100).toDF("i")
          .withColumn("ts", lit(day(d)))
          .withColumn("v", col("i")),
        root, Seq("ts"), tag = s"day$d")
    val coldBefore = files(root, "v0")
    val t = "cwspec_temporal_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$root')")
    try {
      val r = spark.sql(
        s"OPTIMIZE $t WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'")
        .collect()
      assert(r.head.getBoolean(1), "temporal scope did not rewrite")
      assert(files(root, "v0") == coldBefore,
        "temporal scope touched the cold days")
      val dirs = VersionedTable.resolveDirs(spark, root,
        r.head.getLong(0))
      assert(dirs.length == 2 && dirs.head == "v0", dirs)
      assert(spark.table(t).count() == 1200L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("unsupported conjuncts widen, never narrow: an OR predicate " +
      "contributes no bound, so everything rewrites (content still " +
      "exact)") {
    val root = build("widen")
    val v = VersionedTable.compactWhere(spark, root,
      col("k") >= 1001 || col("v") < 0)
    assert(v == 4L)
    // no bound extractable from the OR → every dir was hot → ONE
    // rewritten dir, nothing carried
    val dirs = VersionedTable.resolveDirs(spark, root, v)
    assert(dirs.length == 1 && dirs.head.startsWith("a"), dirs)
    assert(VersionedTable.read(spark, root).count() == 2000L)
  }
}
