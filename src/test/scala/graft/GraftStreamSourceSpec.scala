package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The graft table as a Structured Streaming SOURCE: version-id
  * offsets, initial-snapshot-then-deltas semantics, exactly-once per
  * version (no duplicates across micro-batches), checkpoint recovery
  * through the serialized-offset path, loud failure on non-append
  * commits, ignoreDeletes, and startingVersion tailing.
  */
class GraftStreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"${graft.config.Scratch.runDir}/streamsrc_$name"
    VersionedTable.destroy(spark, root)
    root
  }

  private class Collector {
    val batches =
      scala.collection.mutable.ArrayBuffer[Seq[(Long, Long)]]()
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batches.synchronized {
        batches += df.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      }
    def all: Seq[(Long, Long)] = batches.synchronized {
      batches.flatten.toSeq
    }
  }

  test("initial snapshot then per-version deltas, exactly once: " +
      "appends landing while the stream runs arrive as new batches " +
      "with no row ever repeated") {
    val root = freshRoot("basic")
    VersionedTable.commit(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), root)
    VersionedTable.deleteKeysMor(spark, root, Seq(2L).toDF("k"))
    val c = new Collector
    val q = spark.readStream.format("graft").load(root)
      .writeStream.foreachBatch(c.sink _).start()
    try {
      q.processAllAvailable()
      // initial snapshot: post-delete content (the MoR anti-join
      // applies to the first batch)
      assert(c.all.toSet == Set((1L, 10L)))
      VersionedTable.commitAppend(Seq((3L, 30L)).toDF("k", "v"), root)
      q.processAllAvailable()
      assert(c.all.toSet == Set((1L, 10L), (3L, 30L)))
      VersionedTable.commitAppend(
        Seq((4L, 40L), (5L, 50L)).toDF("k", "v"), root)
      q.processAllAvailable()
      assert(c.all.toSet ==
        Set((1L, 10L), (3L, 30L), (4L, 40L), (5L, 50L)))
      // exactly once: flattened count equals distinct count
      assert(c.all.size == c.all.toSet.size, s"duplicates: ${c.all}")
    } finally q.stop()
  }

  test("a rewrite mid-stream fails loudly; a MoR delete fails unless " +
      "ignoreDeletes, which streams inserts only") {
    val root = freshRoot("guards")
    VersionedTable.commit(Seq((1L, 1L)).toDF("k", "v"), root)
    val c = new Collector
    val q = spark.readStream.format("graft").load(root)
      .writeStream.foreachBatch(c.sink _).start()
    try {
      q.processAllAvailable()
      VersionedTable.deleteKeysMor(spark, root, Seq(1L).toDF("k"))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("merge-on-read delete") ||
        Option(e.getCause).exists(
          _.getMessage.contains("merge-on-read delete")), e.getMessage)
    } finally q.stop()
    // ignoreDeletes: the same table streams on, deletions just absent
    val c2 = new Collector
    val q2 = spark.readStream.format("graft")
      .option("ignoreDeletes", "true").load(root)
      .writeStream.foreachBatch(c2.sink _).start()
    try {
      q2.processAllAvailable()
      assert(c2.all.isEmpty) // initial snapshot is post-delete: empty
      VersionedTable.commitAppend(Seq((2L, 2L)).toDF("k", "v"), root)
      q2.processAllAvailable()
      assert(c2.all.toSet == Set((2L, 2L)))
      // a CONTENT-CHANGING rewrite is never expressible as an
      // append — always fatal (compaction is NOT: see the
      // maintenance-transparency test)
      VersionedTable.commit(Seq((9L, 9L)).toDF("k", "v"), root)
      VersionedTable.commitAppend(Seq((3L, 3L)).toDF("k", "v"), root)
      val e2 = intercept[Exception] { q2.processAllAvailable() }
      assert(e2.getMessage.contains("not an append") ||
        Option(e2.getCause).exists(
          _.getMessage.contains("not an append")), e2.getMessage)
    } finally q2.stop()
  }

  test("maintenance transparency: compaction / sorted OPTIMIZE / " +
      "delete-fold mid-stream REBASE the offset chain — the stream " +
      "survives with no duplicate and no lost row (dataChange=false)") {
    val root = freshRoot("optimize")
    VersionedTable.commit(
      Seq((1L, 1L), (2L, 2L)).toDF("k", "v"), root)
    val c = new Collector
    val q = spark.readStream.format("graft").load(root)
      .writeStream.foreachBatch(c.sink _).start()
    try {
      q.processAllAvailable()
      assert(c.all.toSet == Set((1L, 1L), (2L, 2L)))
      // round 1: bin-pack compaction between two appends
      VersionedTable.commitAppend(Seq((3L, 3L)).toDF("k", "v"), root)
      VersionedTable.compact(spark, root)
      VersionedTable.commitAppend(Seq((4L, 4L)).toDF("k", "v"), root)
      q.processAllAvailable()
      assert(c.all.toSet ==
        Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)), c.all)
      // round 2: a MoR delete folded away by compactDeletes — the
      // fold is content-preserving (rows already gone logically)
      VersionedTable.deleteKeysMor(spark, root, Seq(1L).toDF("k"))
      VersionedTable.compactDeletes(spark, root)
      // the delete itself trips the no-retraction guard... unless the
      // stream consumed it under ignoreDeletes; this stream did NOT,
      // so crossing the delete version fails. Consume the guard:
      VersionedTable.commitAppend(Seq((5L, 5L)).toDF("k", "v"), root)
      intercept[Exception] { q.processAllAvailable() }
    } finally q.stop()
    // a fresh stream's initial snapshot is the CURRENT logical
    // content — the MoR-erased (1,1) is gone, compactions and the
    // fold are invisible, the post-fold append is present
    val c2 = new Collector
    val q2 = spark.readStream.format("graft").load(root)
      .writeStream.foreachBatch(c2.sink _).start()
    try {
      q2.processAllAvailable()
      assert(c2.all.size == c2.all.toSet.size, s"duplicates: ${c2.all}")
      assert(c2.all.toSet == Set((2L, 2L), (3L, 3L),
        (4L, 4L), (5L, 5L)), c2.all)
      // and maintenance keeps being invisible to the LIVE stream:
      // another OPTIMIZE then an append delivers only the append
      VersionedTable.compactSorted(spark, root, Seq("k"))
      VersionedTable.commitAppend(Seq((6L, 6L)).toDF("k", "v"), root)
      q2.processAllAvailable()
      assert(c2.all.toSet == Set((2L, 2L), (3L, 3L), (4L, 4L),
        (5L, 5L), (6L, 6L)), c2.all)
      assert(c2.all.size == c2.all.toSet.size, s"duplicates: ${c2.all}")
    } finally q2.stop()
  }

  test("startingVersion tails new rows only; checkpoint restart " +
      "resumes from the recovered offset without re-emitting") {
    val root = freshRoot("resume")
    val ckpt = s"${graft.config.Scratch.runDir}/streamsrc_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(ckpt))
    VersionedTable.commit(Seq((1L, 1L)).toDF("k", "v"), root)
    VersionedTable.commitAppend(Seq((2L, 2L)).toDF("k", "v"), root)
    // tail from version 2: versions 0-1's rows never stream
    VersionedTable.commitAppend(Seq((3L, 3L)).toDF("k", "v"), root)
    val c = new Collector
    val q = spark.readStream.format("graft")
      .option("startingVersion", "2").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(c.sink _).start()
    try {
      q.processAllAvailable()
      assert(c.all.toSet == Set((3L, 3L)))
    } finally q.stop()
    // append while the stream is DOWN, restart on the checkpoint:
    // only the new version arrives (serialized-offset recovery)
    VersionedTable.commitAppend(Seq((4L, 4L)).toDF("k", "v"), root)
    val c2 = new Collector
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", "2").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(c2.sink _).start()
    try {
      q2.processAllAvailable()
      assert(c2.all.toSet == Set((4L, 4L)), s"got ${c2.all}")
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger paces a commit backlog into bounded " +
      "micro-batches — live, and across a checkpoint restart") {
    val root = freshRoot("ratelimit")
    val ckpt = s"${graft.config.Scratch.runDir}/streamsrc_rl_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(ckpt))
    VersionedTable.commit(Seq((0L, 0L)).toDF("k", "v"), root)
    (1L to 3L).foreach(i => VersionedTable.commitAppend(
      Seq((i, i)).toDF("k", "v"), root))
    val c = new Collector
    def start(col: Collector) = spark.readStream.format("graft")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(col.sink _).start()
    val q = start(c)
    try {
      q.processAllAvailable()
      assert(c.all.toSet == Set((1L, 1L), (2L, 2L), (3L, 3L)))
      // the 3-version backlog drained as THREE one-version batches,
      // not one giant batch
      assert(c.batches.count(_.nonEmpty) == 3, c.batches)
      assert(c.batches.filter(_.nonEmpty).forall(_.size == 1))
    } finally q.stop()
    // a backlog accumulated while the stream was DOWN restarts paced:
    // the durable rate floor seeds below the backlog, batches stay
    // one version each
    (4L to 6L).foreach(i => VersionedTable.commitAppend(
      Seq((i, i)).toDF("k", "v"), root))
    val c2 = new Collector
    val q2 = start(c2)
    try {
      q2.processAllAvailable()
      assert(c2.all.toSet == Set((4L, 4L), (5L, 5L), (6L, 6L)))
      assert(c2.batches.count(_.nonEmpty) == 3, c2.batches)
    } finally q2.stop()
  }

  test("maxBytesPerTrigger extends a batch only until the versions' " +
      "delta bytes reach the cap — a tiny cap yields one version per " +
      "batch, a huge cap one batch for the whole backlog") {
    val root = freshRoot("bytelimit")
    VersionedTable.commit(Seq((0L, 0L)).toDF("k", "v"), root)
    (1L to 3L).foreach(i => VersionedTable.commitAppend(
      Seq((i, i)).toDF("k", "v"), root))
    def run(cap: Long): Seq[Int] = {
      val c = new Collector
      val q = spark.readStream.format("graft")
        .option("startingVersion", "1")
        .option("maxBytesPerTrigger", cap.toString).load(root)
        .writeStream.foreachBatch(c.sink _).start()
      try {
        q.processAllAvailable()
        assert(c.all.toSet == Set((1L, 1L), (2L, 2L), (3L, 3L)))
        c.batches.filter(_.nonEmpty).map(_.size).toSeq
      } finally q.stop()
    }
    // 1 byte: every version's delta alone exceeds the cap — three
    // single-version batches (progress over strictness)
    assert(run(1L) == Seq(1, 1, 1))
    // 1 GB: the whole backlog fits one batch
    assert(run(1L << 30) == Seq(3))
  }

  test("startingTimestamp tails from the first commit at or after the " +
      "instant (manifest commit times); a future timestamp streams " +
      "new commits only") {
    val root = freshRoot("startts")
    VersionedTable.commit(Seq((1L, 1L)).toDF("k", "v"), root)
    Thread.sleep(5)
    val cut = System.currentTimeMillis()
    Thread.sleep(5)
    VersionedTable.commitAppend(Seq((2L, 2L)).toDF("k", "v"), root)
    VersionedTable.commitAppend(Seq((3L, 3L)).toDF("k", "v"), root)
    val c = new Collector
    val q = spark.readStream.format("graft")
      .option("startingTimestamp", cut.toString).load(root)
      .writeStream.foreachBatch(c.sink _).start()
    try {
      q.processAllAvailable()
      // only the two post-cut commits stream; v0's row never does
      assert(c.all.toSet == Set((2L, 2L), (3L, 3L)), c.all)
    } finally q.stop()
    // a timestamp beyond every commit: nothing until a NEW commit
    val c2 = new Collector
    val q2 = spark.readStream.format("graft")
      .option("startingTimestamp",
        (System.currentTimeMillis() + 3600000L).toString).load(root)
      .writeStream.foreachBatch(c2.sink _).start()
    try {
      q2.processAllAvailable()
      assert(c2.all.isEmpty, c2.all)
      VersionedTable.commitAppend(Seq((9L, 9L)).toDF("k", "v"), root)
      q2.processAllAvailable()
      assert(c2.all.toSet == Set((9L, 9L)), c2.all)
    } finally q2.stop()
    // both options together are refused
    intercept[Exception] {
      spark.readStream.format("graft")
        .option("startingTimestamp", "0")
        .option("startingVersion", "1").load(root)
        .writeStream.foreachBatch(c.sink _).start()
    }
  }

  test("Trigger.AvailableNow drains the whole backlog under " +
      "maxVersionsPerTrigger pacing, then stops on its own") {
    val root = freshRoot("availnow")
    VersionedTable.commit(Seq((0L, 0L)).toDF("k", "v"), root)
    (1L to 4L).foreach(i => VersionedTable.commitAppend(
      Seq((i, i)).toDF("k", "v"), root))
    val c = new Collector
    val q = spark.readStream.format("graft")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "2").load(root)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(c.sink _).start()
    // AvailableNow terminates by itself once caught up
    assert(q.awaitTermination(120000L), "query did not self-terminate")
    assert(c.all.toSet == (1L to 4L).map(i => (i, i)).toSet, c.all)
    assert(c.batches.count(_.nonEmpty) >= 2, s"pacing lost: ${c.batches}")
  }

  test("pinOffsets moves a stream_<id> branch ref with the committed " +
      "offset, and vacuum retains the whole suffix a restart needs") {
    val root = freshRoot("pin")
    val ckpt = s"${graft.config.Scratch.runDir}/streamsrc_pin_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(ckpt))
    VersionedTable.commit(Seq((0L, 0L)).toDF("k", "v"), root)
    val c = new Collector
    def start(col: Collector) = spark.readStream.format("graft")
      .option("pinOffsets", "true").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(col.sink _).start()
    val q = start(c)
    try {
      q.processAllAvailable()
      assert(c.all.toSet == Set((0L, 0L)))
    } finally q.stop()
    // the pin landed as a movable stream_ ref at the committed offset
    val pins = VersionedTable.listRefs(spark, root)
      .filter(_._1.startsWith(VersionedTable.StreamPinPrefix))
    assert(pins.nonEmpty && pins.forall(_._3), pins)
    // five appends while the stream is down, then aggressive
    // retention: without the pin, vacuum(keepLast=1) would expire
    // the mid-backlog manifests the restart must walk
    (1L to 5L).foreach(i => VersionedTable.commitAppend(
      Seq((i, i)).toDF("k", "v"), root))
    VersionedTable.vacuum(spark, root, keepLast = 1)
    val c2 = new Collector
    val q2 = start(c2)
    try {
      q2.processAllAvailable()
      assert(c2.all.toSet == (1L to 5L).map(i => (i, i)).toSet,
        s"got ${c2.all}")
    } finally q2.stop()
    // decommissioning = dropping the ref; the suffix becomes
    // vacuumable again
    pins.foreach(p => VersionedTable.dropRef(spark, root, p._1))
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(VersionedTable.versions(spark, root).size == 1)
  }

  test("CDF replication applies a MIXED upsertMor version correctly: " +
      "deletes before inserts within the version, mirror equals the " +
      "source's logical content") {
    val src = freshRoot("cdfmix_src")
    val dst = freshRoot("cdfmix_dst")
    VersionedTable.commit(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), src)
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(src)
      .writeStream.foreachBatch(
        graft.streaming.StreamingIvm.cdfApplier(spark, dst,
          Seq("k"))).start()
    try {
      q.processAllAvailable()
      // ONE mixed commit: update k=2, insert k=9, delete-request k=3
      // and the absent k=99 through deleteIf
      VersionedTable.upsertMor(spark, src,
        Seq((2L, 22L, "u"), (9L, 90L, "i"), (3L, 0L, "d"),
          (99L, 0L, "d")).toDF("k", "v", "op"),
        Seq("k"), deleteIf = Some(col("op") === "d"))
      q.processAllAvailable()
      val want = Set((1L, 10L), (2L, 22L), (9L, 90L))
      assert(VersionedTable.read(spark, src).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == want)
      assert(VersionedTable.read(spark, dst).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == want,
        "mirror diverged from source after a mixed CDF version")
    } finally q.stop()
  }

  test("CDF over a shallow clone: carried pre-clone deletes never " +
      "re-stream, clone-side inserts and deletes tag with the " +
      "clone's own commit versions") {
    val src = freshRoot("cdfclone_src")
    val root = freshRoot("cdfclone_dst")
    VersionedTable.commit(
      Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("k", "v"), src)
    // a pre-clone MoR delete: the clone carries this sidecar with a
    // REBASED negative sequence — it must read as absent content,
    // never as a delete CHANGE on the clone's feed
    VersionedTable.deleteKeysMor(spark, src, Seq(2L).toDF("k"))
    VersionedTable.cloneShallow(spark, src, root)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String,
      Long)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(root)
      .writeStream.foreachBatch {
        (df: org.apache.spark.sql.DataFrame, _: Long) =>
          rows.synchronized {
            rows ++= df.collect().map(r =>
              (r.getLong(0), r.getString(2), r.getLong(3)))
          }
          ()
      }.start()
    try {
      q.processAllAvailable()
      // initial snapshot: live content only, as inserts at clone v0
      assert(rows.toSet == Set((1L, "insert", 0L), (3L, "insert", 0L)),
        rows.toSet)
      VersionedTable.commitAppend(Seq((4L, 4L)).toDF("k", "v"), root)
      VersionedTable.deleteKeysMor(spark, root, Seq(3L).toDF("k"))
      q.processAllAvailable()
      assert(rows.toSet == Set(
        (1L, "insert", 0L), (3L, "insert", 0L),
        (4L, "insert", 1L), (3L, "delete", 2L)), rows.toSet)
      assert(rows.size == rows.toSet.size, s"duplicates: $rows")
    } finally q.stop()
  }

  test("change data feed: inserts AND delete keys stream with " +
      "_change_type/_commit_version; maintenance stays invisible; a " +
      "content rewrite still fails") {
    val root = freshRoot("cdf")
    VersionedTable.commit(
      Seq((1L, 1L), (2L, 2L)).toDF("k", "v"), root)
    val rows =
      scala.collection.mutable.ArrayBuffer[(Long, Option[Long], String,
        Long)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(root)
      .writeStream.foreachBatch {
        (df: org.apache.spark.sql.DataFrame, _: Long) =>
          rows.synchronized {
            rows ++= df.collect().map(r => (r.getLong(0),
              if (r.isNullAt(1)) None else Some(r.getLong(1)),
              r.getString(2), r.getLong(3)))
          }
          ()
      }.start()
    try {
      q.processAllAvailable()
      // initial snapshot: inserts at the start version
      assert(rows.toSet == Set((1L, Some(1L), "insert", 0L),
        (2L, Some(2L), "insert", 0L)))
      VersionedTable.commitAppend(Seq((3L, 3L)).toDF("k", "v"), root)
      VersionedTable.deleteKeysMor(spark, root, Seq(1L).toDF("k"))
      VersionedTable.compact(spark, root) // invisible to the feed
      VersionedTable.commitAppend(Seq((4L, 4L)).toDF("k", "v"), root)
      q.processAllAvailable()
      assert(rows.toSet == Set(
        (1L, Some(1L), "insert", 0L), (2L, Some(2L), "insert", 0L),
        (3L, Some(3L), "insert", 1L),
        (1L, None, "delete", 2L),
        (4L, Some(4L), "insert", 4L)), rows.toSet)
      assert(rows.size == rows.toSet.size, s"duplicates: $rows")
      // a content-changing rewrite has no incremental diff
      VersionedTable.commit(Seq((9L, 9L)).toDF("k", "v"), root)
      intercept[Exception] { q.processAllAvailable() }
    } finally q.stop()
  }

  test("mid-stream schema evolution fails the stream loudly with a " +
      "restart hint — never a silent positional rebind") {
    val root = freshRoot("midevo")
    VersionedTable.commit(Seq((1L, 1L)).toDF("k", "v"), root)
    val c = new Collector
    val q = spark.readStream.format("graft").load(root)
      .writeStream.foreachBatch(c.sink _).start()
    try {
      q.processAllAvailable()
      VersionedTable.renameColumn(spark, root, "v", "val")
      VersionedTable.commitAppend(Seq((2L, 2L)).toDF("k", "val"), root)
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("schema changed mid-stream")),
        msgs(e).mkString(" | "))
    } finally q.stop()
  }

  test("deltas project through the field mapping: a stream over an " +
      "evolved table emits logical names and widened types") {
    val root = freshRoot("evolved")
    VersionedTable.commit(Seq((1, 1L)).toDF("k", "v"), root)
    VersionedTable.renameColumn(spark, root, "v", "val")
    VersionedTable.widenColumn(spark, root, "k", "BIGINT")
    val c = new Collector
    val q = spark.readStream.format("graft").load(root)
      .writeStream.foreachBatch(c.sink _).start()
    try {
      q.processAllAvailable()
      assert(c.all.toSet == Set((1L, 1L)))
      VersionedTable.commitAppend(
        Seq((5000000000L, 5L)).toDF("k", "val"), root)
      q.processAllAvailable()
      assert(c.all.toSet == Set((1L, 1L), (5000000000L, 5L)))
    } finally q.stop()
  }

  test("CDF applier replay idempotence survives mirror tag expiry: " +
      "the durable per-half high-water marks gate versions whose " +
      "cdf-* tags a retention sweep already expired") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val dst = freshRoot("cdfhwm_dst")
    VersionedTable.commit(Seq((0L, 0L)).toDF("k", "v"), dst,
      tag = "base")
    def cdfBatch(v: Long, rows: Seq[(Long, Long)]) =
      rows.toDF("k", "v")
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v))
    def count() = VersionedTable.read(spark, dst).count()
    val apply1 = graft.streaming.StreamingIvm.cdfApplier(spark, dst,
      Seq("k"))
    apply1(cdfBatch(1L, Seq((1L, 10L))), 0L)
    apply1(cdfBatch(2L, Seq((2L, 20L))), 1L)
    assert(count() == 3L)
    // retention sweep: only the newest mirror manifest survives, so
    // the committed-tag ledger no longer remembers cdf-ins-1 — the
    // exact window the round-13 advice flagged
    VersionedTable.vacuum(spark, dst, keepLast = 1)
    assert(!VersionedTable.committedTags(spark, dst)
      .contains("cdf-ins-1"))
    // a restart replaying the WHOLE backlog (at-least-once) must skip
    // both versions on the durable high-water mark alone
    val apply2 = graft.streaming.StreamingIvm.cdfApplier(spark, dst,
      Seq("k"))
    apply2(cdfBatch(1L, Seq((1L, 10L))), 0L)
    apply2(cdfBatch(2L, Seq((2L, 20L))), 1L)
    assert(count() == 3L,
      "a replay older than the mirror's tag retention re-applied")
    // genuinely new source versions still apply
    apply2(cdfBatch(3L, Seq((3L, 30L))), 2L)
    assert(count() == 4L)
  }
}
