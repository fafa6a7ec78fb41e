package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ivm
import graft.sources.VersionedTable

/** Streaming incremental view maintenance: a `foreachBatch` sink that
  * folds each micro-batch's [[Ivm.aggState]] into a persistent state
  * table, so the rollup stays fresh per batch while only state-sized
  * data (|keys| rows) is ever rewritten — the raw stream is read once
  * and never again. Because every state component is a commutative
  * monoid, the final state is independent of batch boundaries and
  * arrival order, and equals the batch recompute over the whole log —
  * which is exactly what the contract oracle pins.
  *
  * The state lives in a [[graft.sources.VersionedTable]]: each batch
  * commits a new snapshot (manifest-last, so readers never see a
  * half-written state) TAGGED with its batch id — `foreachBatch`
  * delivers at-least-once after a crash-restart, and skipping any
  * batch at or below the last committed tag makes the sink
  * exactly-once (the recovery path StreamingIvmSpec forces). Past
  * states stay time-travelable per batch.
  */
object StreamingIvm {

  /** Fold one micro-batch into the versioned state at `stateRoot`.
    * Idempotent under replay: batch ids at or below the last
    * committed tag are already folded and are skipped.
    */
  def foldBatch(spark: SparkSession, stateRoot: String, keys: Seq[String],
      valueCol: String, userCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val replayed = VersionedTable.latestTag(spark, stateRoot)
      .flatMap(_.toLongOption).exists(_ >= batchId)
    if (!replayed) {
      val st = Ivm.aggState(batch, keys, valueCol, userCol)
      val merged = VersionedTable.latestVersion(spark, stateRoot) match {
        case Some(v) => Ivm.merge(
          Seq(VersionedTable.readVersion(spark, stateRoot, v), st), keys)
        case None => st
      }
      VersionedTable.commit(merged, stateRoot, tag = batchId.toString)
      ()
    }
  }

  /** Recursive delete; every directory stream is closed (walk/list
    * hold an open directory handle otherwise).
    */
  private def rmTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.delete(q))
      finally s.close()
    }

  /** Stage `parts` as one parquet file each under `staged`
    * (part0.parquet, part1.parquet, ...) with PINNED ascending
    * modification times — the file stream source processes files in
    * mtime order, and batch ORDER is part of every replay contract
    * here, so it must never ride on write-timing luck. Shared by the
    * IVM, table-ingest, erasure, and dedup-ingest stagers.
    */
  private def stageOrderedParts(staged: java.nio.file.Path,
      parts: Seq[DataFrame]): Unit = {
    rmTree(staged)
    parts.zipWithIndex.foreach { case (d, i) =>
      d.coalesce(1).write.mode("overwrite").parquet(s"$staged/b$i")
    }
    val files = parts.indices.flatMap { i =>
      val s = Files.list(Paths.get(s"$staged/b$i"))
      try s.toArray.map(_.toString).filter(_.endsWith(".parquet"))
      finally s.close()
    }
    files.zipWithIndex.foreach { case (f, i) =>
      val dst = staged.resolve(s"part$i.parquet")
      Files.move(Paths.get(f), dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
      ()
    }
    parts.indices.foreach(i => rmTree(Paths.get(s"$staged/b$i")))
  }

  /** Stage the events log as TWO "arriving" files split at `cut`
    * (one per half, via [[stageOrderedParts]]), so
    * `maxFilesPerTrigger=1` replays it as exactly two micro-batches.
    * Restages from scratch every call — a stale layout must never
    * leak across code versions. Shared by the IVM and table-ingest
    * pipelines.
    */
  private def stageTwoBatches(spark: SparkSession, dir: String,
      staged: java.nio.file.Path, cut: String,
      cols: Seq[String] = Nil): Unit = {
    val ev0 = graft.sources.EventsSource.read(spark, dir)
    val ev = if (cols.isEmpty) ev0
      else ev0.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val t = col("ts")
    stageOrderedParts(staged, Seq(ev.where(t < cut), ev.where(t >= cut)))
  }

  /** Replay the events log as a TWO-micro-batch file stream (split at
    * `cut`, one file per half, maxFilesPerTrigger=1), maintain the
    * per-event-type state across batches, and return the finalized
    * rollup joined with the exact distinct-user count (the HLL
    * tolerance flag convention of `hll_rollup`/`ivm_merge`).
    */
  def runStreamingIvm(spark0: SparkSession, dir: String,
      cut: String = "2024-01-16"): DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/events.parquet"))
    val keys = Seq("event_type")
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val staged = Paths.get(s"${graft.config.Scratch.runDir}/ivm_stream_$tag")
    val stateRoot = s"${graft.config.Scratch.runDir}/ivm_state_$tag"

    // stage the two "arriving" batch files deterministically — ts
    // already NORMALIZED to TimestampType so the stream schema is the
    // staged files' own schema regardless of the source generation
    stageTwoBatches(spark, dir, staged, cut)
    // fresh state per run (reruns must not double-count)
    VersionedTable.destroy(spark, stateRoot)

    val stream = spark.readStream
      .schema(spark.read.parquet(staged.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)

    val q = stream.writeStream
      .foreachBatch(foldBatch(spark, stateRoot, keys, "value", "user_id") _)
      .start()
    try q.processAllAvailable() finally q.stop()

    val exact = graft.sources.EventsSource.read(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    Ivm.finalizeState(VersionedTable.read(spark, stateRoot), keys)
      .join(exact, "event_type")
      .select(col("event_type"), col("n"), col("sum_v"), col("min_v"),
        col("max_v"), col("avg_v"), col("n_exact"),
        (abs(col("n_distinct_est") - col("n_exact")) /
          col("n_exact") <= 0.05).cast("int").as("within_5pct"))
      .orderBy("event_type")
  }

  /** A stateful ingest SINK for the versioned table at `tableRoot`:
    * each delivered micro-batch lands as an optimistic fast append
    * tagged with its batch id, idempotent under at-least-once replay
    * the same way [[foldBatch]] is (ids are monotone, a batch at or
    * below the last committed tag is already appended and skips).
    * The sink is the table's ONLY writer — the streaming contract —
    * so the last committed tag is CACHED in the sink after the first
    * manifest read: replay detection then costs zero I/O per batch
    * instead of a root listing + manifest read (the per-batch
    * metadata constant r9 flagged at 10x). A restarted query builds
    * a fresh sink whose first batch re-seeds the cache from the
    * newest manifest, which is exactly the recovery read Delta-style
    * idempotent sinks do.
    */
  /** Batch-id tag namespacing for sinks that SHARE a table: a sink's
    * tags are `<streamId>-<batchId>` (bare batch ids when `streamId`
    * is empty — the single-stream contract, unchanged), and recovery
    * seeding parses only the sink's OWN namespace out of the commit
    * history. With the newest-tag-only seed, an erasure commit landing
    * between an ingest stream's batches would mask the ingest's high
    * water mark on restart and replay an already-committed batch —
    * the multi-sink lifecycle (ingest, erase, re-register) needs
    * per-stream high water marks.
    */
  private def tagOf(streamId: String, batchId: Long): String =
    if (streamId.isEmpty) batchId.toString else s"$streamId-$batchId"

  private def seedHighWater(spark: SparkSession, tableRoot: String,
      streamId: String): Option[Long] = {
    def parse(t: String): Option[Long] =
      if (streamId.isEmpty) t.toLongOption
      else if (t.startsWith(streamId + "-"))
        t.stripPrefix(streamId + "-").toLongOption
      else None
    // NOT error-swallowed: history() returns Nil for a fresh (not yet
    // committed) table, and a transient read failure must fail the
    // batch loudly so the stream retries — a silently-lost high water
    // mark would re-append already-committed batches.
    // The seed is the MAX of the tag parse and the durable per-stream
    // hwm file: tags alone are vacuum-fragile (a retention sweep can
    // expire the manifest holding this stream's newest namespaced tag
    // while another stream's commit is the table head), and the hwm
    // file alone can lag by the one batch a crash interleaves between
    // commit and hwm write — together they cover both windows.
    (VersionedTable.history(spark, tableRoot)
       .flatMap { case (_, t) => parse(t) } ++
      VersionedTable.readStreamHighWater(spark, tableRoot, streamId))
      .maxOption
  }

  private def recordHighWater(spark: SparkSession, tableRoot: String,
      streamId: String, batchId: Long): Unit =
    VersionedTable.writeStreamHighWater(spark, tableRoot, streamId,
      batchId)

  private[graft] def ingestSink(spark: SparkSession, tableRoot: String,
      streamId: String = ""): (DataFrame, Long) => Unit = {
    var lastSeen: Option[Long] = None
    var seeded = false
    (batch: DataFrame, batchId: Long) => {
      if (!seeded && lastSeen.isEmpty) {
        lastSeen = seedHighWater(spark, tableRoot, streamId)
        seeded = true
      }
      if (lastSeen.exists(_ >= batchId)) ()
      else {
        VersionedTable.commitAppendRetry(batch, tableRoot,
          tag = tagOf(streamId, batchId))
        recordHighWater(spark, tableRoot, streamId, batchId)
        lastSeen = Some(batchId)
      }
    }
  }

  /** One-shot form of [[ingestSink]] (fresh cache, so the replay
    * check always consults the newest manifest) — the direct-call
    * surface the replay spec exercises.
    */
  private[graft] def ingestBatch(spark: SparkSession, tableRoot: String)(
      batch: DataFrame, batchId: Long): Unit =
    ingestSink(spark, tableRoot)(batch, batchId)

  /** Erasure sink: each micro-batch of delete-key requests lands as
    * ONE merge-on-read delete commit ([[VersionedTable.deleteKeysMor]]
    * — O(keys) sidecar write, no data byte touched), tagged with the
    * batch id and guarded by the same single-writer tag cache as
    * [[ingestSink]], so an at-least-once replay of a request batch
    * never commits a second version. This is the GDPR-stream shape:
    * deletion requests take effect in metadata time and
    * `compactDeletes` folds them into data on the operator's schedule.
    */
  private[graft] def erasureSink(spark: SparkSession, tableRoot: String,
      streamId: String = ""): (DataFrame, Long) => Unit = {
    var lastSeen: Option[Long] = None
    var seeded = false
    (batch: DataFrame, batchId: Long) => {
      if (!seeded && lastSeen.isEmpty) {
        lastSeen = seedHighWater(spark, tableRoot, streamId)
        seeded = true
      }
      if (lastSeen.exists(_ >= batchId)) ()
      else {
        VersionedTable.deleteKeysMor(spark, tableRoot, batch,
          tag = tagOf(streamId, batchId))
        recordHighWater(spark, tableRoot, streamId, batchId)
        lastSeen = Some(batchId)
      }
    }
  }

  /** Dedup-gated ingest sink: each micro-batch is first deduplicated
    * WITHIN itself (min-id survivor per content hash — a map-side-
    * combinable groupBy + semi join, no window), then gated against
    * the table's current content through the Bloom-prefiltered
    * [[graft.operators.Dedup.incrementalNew]] (definitely-new rows
    * never shuffle; only might-contain rows pay the exact anti-join),
    * and only the survivors fast-append. Batch-id tags + the cached
    * single-writer check make replays exactly-once, like
    * [[ingestSink]]. This is the continuously-admitting deduplicated
    * corpus loop — the every-batch shape of a training-data pipeline.
    * Honest per-batch cost: building the Bloom re-scans the table
    * (inherent — the filter must cover all admitted content, and a
    * restart loses any cached one); what the sink DOES avoid is the
    * counting scan (its running admitted count sizes the filter) and
    * any metadata I/O for replay detection. For a corpus where even
    * one scan per batch is too much, the filter would move into the
    * table as a commit-maintained sidecar — the same shape as the
    * stats sidecars.
    */
  private[graft] def dedupIngestSink(spark: SparkSession,
      tableRoot: String): (DataFrame, Long) => Unit = {
    var lastSeen: Option[Long] = None
    var seenCount: Long = -1L // -1 = unseeded; first batch scans once
    (batch: DataFrame, batchId: Long) => {
      val last = lastSeen.orElse(
        VersionedTable.latestTag(spark, tableRoot).flatMap(_.toLongOption))
      if (last.exists(_ >= batchId)) lastSeen = last
      else {
        // intra-batch survivor directly from ONE aggregate: min id
        // per content. (A join-back on the id alone would re-admit a
        // same-id row with DIFFERENT content, and a literally
        // double-delivered row would survive a semi-join twice —
        // at-least-once delivery makes both real inputs.)
        val intra = batch
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), col("text"))
        val seen = VersionedTable.read(spark, tableRoot)
        // the sink owns the table (single-writer), so its running
        // admitted count sizes the Bloom without re-counting the
        // corpus every batch; the first batch seeds it with one scan
        if (seenCount < 0) seenCount = seen.count()
        val fresh = graft.operators.Dedup.incrementalNew(intra, seen,
          "text", expectedSeen = math.max(1024L, seenCount))
        val admitted = fresh.persist()
        try {
          val nAdmitted = admitted.count()
          VersionedTable.commitAppend(admitted, tableRoot,
            tag = batchId.toString)
          seenCount += nAdmitted
          lastSeen = Some(batchId)
        } finally { admitted.unpersist(); () }
      }
    }
  }

  /** Streaming dedup-gated ingestion end-to-end: replay the documents
    * table as two micro-batches (doc_id halves) through
    * [[dedupIngestSink]] into an initially-empty snapshot table. The
    * admitted set must be exactly "earliest batch containing the
    * content wins; smallest id within that batch wins" — independent
    * of HOW the batches' internals were ordered, which is what the
    * contract oracle pins. Batch order is forced deterministic by
    * staged-file modification times (the file source processes in
    * mtime order).
    */
  def runStreamingDedupIngest(spark0: SparkSession, dir: String,
      cut: Long = 250L): DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/documents.parquet"))
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val staged = Paths.get(
      s"${graft.config.Scratch.runDir}/dedup_stream_$tag")
    val tableRoot = s"${graft.config.Scratch.runDir}/dedup_table_$tag"
    VersionedTable.destroy(spark, tableRoot)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // empty seed commit: the sink's first read sees the schema, no rows
    VersionedTable.commit(docs.limit(0), tableRoot, tag = "base")
    // the second batch carries PLANTED duplicates (the corpus itself
    // may be dup-free at small SF): re-sends of first-batch content
    // under fresh ids (cross-batch dups the table gate must reject)
    // and double-sends of its own content (intra-batch dups the
    // keep-first rule must collapse) — without them the contract
    // would pass vacuously on a broken gate
    val b0 = docs.where(col("doc_id") < cut)
    val b1 = docs.where(col("doc_id") >= cut)
      .unionByName(docs.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(docs.where(col("doc_id").between(cut, cut + 9))
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    stageOrderedParts(staged, Seq(b0, b1))
    val stream = spark.readStream
      .schema(spark.read.parquet(staged.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
    val q = stream.writeStream
      .foreachBatch(dedupIngestSink(spark, tableRoot))
      .start()
    try q.processAllAvailable() finally q.stop()
    VersionedTable.read(spark, tableRoot)
      .select(col("doc_id")).orderBy("doc_id")
  }

  /** Streaming GDPR erasure end-to-end: commit a base snapshot of
    * orders, then replay a stream of delete-key requests (two
    * micro-batches: the %7 keys, then the %11 keys) through
    * [[erasureSink]] — one merge-on-read commit per batch — and
    * return the surviving content aggregated by status. The result
    * must equal the plain anti-filter of the source whatever the
    * batch boundaries; base tag "base" (not a number) so batch id 0
    * is never mistaken for already-committed.
    */
  def runStreamingGdprErasure(spark0: SparkSession, dir: String)
      : DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/orders.parquet"))
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val staged = Paths.get(
      s"${graft.config.Scratch.runDir}/erase_stream_$tag")
    val tableRoot = s"${graft.config.Scratch.runDir}/erase_table_$tag"
    VersionedTable.destroy(spark, tableRoot)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
    VersionedTable.commit(o, tableRoot, tag = "base")
    // two deterministic delete-request batches staged as one file each
    stageOrderedParts(staged, Seq(7L, 11L).map(m =>
      o.where(col("o_orderkey") % m === 0).select(col("o_orderkey"))))
    val stream = spark.readStream
      .schema(spark.read.parquet(staged.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
    val q = stream.writeStream
      .foreachBatch(erasureSink(spark, tableRoot))
      .start()
    try q.processAllAvailable() finally q.stop()
    VersionedTable.read(spark, tableRoot)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** Drain one staged file-stream through a foreachBatch sink
    * (maxFilesPerTrigger=1 — one micro-batch per staged file).
    */
  private def drainStream(spark: SparkSession,
      staged: java.nio.file.Path,
      sink: (DataFrame, Long) => Unit): Unit = {
    val stream = spark.readStream
      .schema(spark.read.parquet(staged.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
    val q = stream.writeStream.foreachBatch(sink).start()
    try q.processAllAvailable() finally q.stop()
  }

  /** The full GDPR lifecycle on ONE table through the streaming sinks:
    * an ingest stream lands the corpus, an erasure stream deletes a
    * key set in metadata time (merge-on-read sidecars), and a second
    * ingest stream RE-REGISTERS a subset of the erased keys with new
    * rows. Sequence-scoped deletes make the re-registered rows visible
    * (their append outsequences the erasure) while the never-
    * re-registered erasures stay gone and no pre-erasure copy
    * resurfaces — the combination the round-10 advice flagged as
    * load-bearing. Each stream idempotes in its OWN tag namespace
    * ([[seedHighWater]]), so a restart of any phase replays nothing
    * even though the table's newest tag belongs to a different stream.
    */
  def runStreamingEraseReingest(spark0: SparkSession, dir: String)
      : DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/orders.parquet"))
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val root = s"${graft.config.Scratch.runDir}/reingest_table_$tag"
    val run = graft.config.Scratch.runDir
    VersionedTable.destroy(spark, root)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    val k = col("o_orderkey")
    // phase 1: corpus lands in two micro-batches
    val staged1 = Paths.get(s"$run/reingest_in_$tag")
    stageOrderedParts(staged1, Seq(o.where(k % 2 === 0),
      o.where(k % 2 === 1)))
    drainStream(spark, staged1, ingestSink(spark, root, "ingest1"))
    // phase 2: erasure requests for the %7 keys, two request batches
    val stagedE = Paths.get(s"$run/reingest_erase_$tag")
    stageOrderedParts(stagedE, Seq(
      o.where(k % 14 === 0).select(k),
      o.where(k % 7 === 0 && k % 14 =!= 0).select(k)))
    drainStream(spark, stagedE, erasureSink(spark, root, "erase1"))
    // phase 3: the %14 users re-register with NEW rows
    val staged2 = Paths.get(s"$run/reingest_re_$tag")
    stageOrderedParts(staged2, Seq(o.where(k % 14 === 0)
      .select(k, (col("o_totalprice") + 1000d).as("o_totalprice"))))
    drainStream(spark, staged2, ingestSink(spark, root, "ingest2"))
    VersionedTable.read(spark, root)
      .groupBy(when(k % 14 === 0, "reinserted")
        .when(k % 7 === 0, "erased")
        .otherwise("kept").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
      .orderBy("grp")
  }

  /** Streaming ingestion INTO the snapshot table layer: every arriving
    * micro-batch lands as one optimistic fast append
    * ([[VersionedTable.commitAppendRetry]] — per-batch cost is the
    * delta write plus one atomic manifest create, no byte of history
    * rewritten), TAGGED with its batch id so an at-least-once restart
    * is detectable and skipped ([[ingestSink]]). Readers time-travel
    * any prefix of the ingest; the final table must equal the batch
    * replay of the raw log whatever the micro-batch boundaries —
    * which is what the contract oracle pins.
    */
  /** Table-to-table streaming — the lakehouse pipeline shape (a
    * bronze table TAILS into silver) with both ends on the snapshot
    * layer: the SOURCE is a graft table read through the streaming
    * source (`readStream.format("graft")` — version-id offsets, each
    * micro-batch reads exactly the delta directories, never a
    * snapshot rescan), the SINK the exactly-once tagged ingest. The
    * source is seeded with a commit plus an append (initial snapshot
    * AND a delta batch stream), and a third append lands WHILE the
    * query runs — the sink table must equal the batch union whatever
    * the micro-batch boundaries, which is what the oracle pins.
    */
  def runStreamFromTable(spark0: SparkSession, dir: String): DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/events.parquet"))
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val srcRoot = s"${graft.config.Scratch.runDir}/stream_fromtbl_src_$tag"
    val dstRoot = s"${graft.config.Scratch.runDir}/stream_fromtbl_dst_$tag"
    VersionedTable.destroy(spark, srcRoot)
    VersionedTable.destroy(spark, dstRoot)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    def part(i: Int) =
      ev.where(pmod(col("event_id"), lit(3)) === i)
    VersionedTable.commit(part(0), srcRoot, tag = "base")
    VersionedTable.commitAppend(part(1), srcRoot, tag = "delta1")
    val q = spark.readStream.format("graft").load(srcRoot)
      .writeStream.foreachBatch(ingestSink(spark, dstRoot)).start()
    try {
      q.processAllAvailable()
      VersionedTable.commitAppend(part(2), srcRoot, tag = "delta2")
      q.processAllAvailable()
    } finally q.stop()
    VersionedTable.read(spark, dstRoot)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy("event_type")
  }

  /** Change-data-feed REPLICATION between two graft tables: the
    * mirror tails the source's CDF stream (`readChangeFeed` — inserts
    * AND delete keys, each tagged `_commit_version`) and APPLIES each
    * source commit in order: insert slices land as fast appends,
    * delete slices as merge-on-read erasures. Nothing collects to the
    * driver but the tiny distinct-version list; the slices themselves
    * stay DataFrames all the way into the mirror's commits. An
    * append + an erasure land on the source WHILE the stream runs;
    * the mirror must equal the source's logical content — which is
    * what the oracle pins.
    */
  /** A reusable CDF APPLIER for `foreachBatch` over a
    * `readChangeFeed` stream: applies each source version's slice to
    * the mirror in commit order — delete keys FIRST, then inserts
    * (the documented within-version order; an upsertMor commit
    * carries both, and applying inserts first would erase them with
    * their own version's blind delete keys). Exactly-once under
    * at-least-once replay: every applied half is gated on the
    * mirror's committed-tag ledger (`cdf-del-<v>` / `cdf-ins-<v>`),
    * seeded once from the manifests and maintained in the closure —
    * the ingestSink idempotence shape. A crash between a version's
    * delete and insert halves re-applies only the missing half.
    *
    * The tag ledger alone is VACUUM-FRAGILE (round-13 advice): once a
    * retention sweep expires the mirror manifests carrying a
    * version's `cdf-*` tags, a replay older than the retention window
    * would re-apply it. So each half ALSO advances a durable
    * per-half high-water file (`cdf-del` / `cdf-ins` stream ids —
    * vacuum never touches ref/hwm files), and the replay gate is
    * hwm-first: versions at or below the hwm skip without consulting
    * tags at all. Tags still cover the one half a crash can
    * interleave between its commit and its hwm write.
    */
  private[graft] def cdfApplier(spark: SparkSession, dstRoot: String,
      keyCols: Seq[String]): (DataFrame, Long) => Unit = {
    var applied: Set[String] = null
    var delHwm = Long.MinValue
    var insHwm = Long.MinValue
    (batch: DataFrame, _: Long) => {
      if (applied == null) {
        applied = VersionedTable.committedTags(spark, dstRoot)
        delHwm = VersionedTable.readStreamHighWater(spark, dstRoot,
          "cdf-del").getOrElse(Long.MinValue)
        insHwm = VersionedTable.readStreamHighWater(spark, dstRoot,
          "cdf-ins").getOrElse(Long.MinValue)
      }
      batch.persist()
      try {
        val versions = batch.select(col("_commit_version")).distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { v =>
          val slice = batch.where(col("_commit_version") === v)
          val dels = slice.where(col("_change_type") === "delete")
            .select(keyCols.map(col): _*)
          val ins = slice.where(col("_change_type") === "insert")
            .drop("_change_type", "_commit_version")
          val delTag = s"cdf-del-$v"
          val insTag = s"cdf-ins-$v"
          if (v > delHwm) {
            if (!applied(delTag) && !dels.isEmpty) {
              VersionedTable.deleteKeysMor(spark, dstRoot, dels,
                tag = delTag)
              applied += delTag
            }
            // advanced even for empty halves: the hwm must outlive
            // tag retention for EVERY replicated version
            VersionedTable.writeStreamHighWater(spark, dstRoot,
              "cdf-del", v)
            delHwm = v
          }
          if (v > insHwm) {
            if (!applied(insTag) && !ins.isEmpty) {
              VersionedTable.commitAppend(ins, dstRoot, tag = insTag)
              applied += insTag
            }
            VersionedTable.writeStreamHighWater(spark, dstRoot,
              "cdf-ins", v)
            insHwm = v
          }
        }
      } finally { batch.unpersist(); () }
    }
  }

  def runStreamCdfReplicate(spark0: SparkSession, dir: String)
      : DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/orders.parquet"))
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val srcRoot = s"${graft.config.Scratch.runDir}/cdf_src_$tag"
    val dstRoot = s"${graft.config.Scratch.runDir}/cdf_dst_$tag"
    VersionedTable.destroy(spark, srcRoot)
    VersionedTable.destroy(spark, dstRoot)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
    VersionedTable.commit(
      o.where(col("o_orderkey") % 2 === 0), srcRoot, tag = "base")
    // exactly-once: an at-least-once micro-batch REPLAY re-delivers
    // source versions the mirror already applied — gate each version
    // on the mirror's committed-tag ledger (seeded once, maintained
    // in the closure), the same idempotence shape as ingestSink's
    // high-water mark
    val applyFeed = cdfApplier(spark, dstRoot, Seq("o_orderkey"))
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(srcRoot)
      .writeStream.foreachBatch(applyFeed).start()
    try {
      q.processAllAvailable()
      VersionedTable.commitAppend(
        o.where(col("o_orderkey") % 2 === 1), srcRoot, tag = "delta")
      VersionedTable.deleteKeysMor(spark, srcRoot,
        o.where(col("o_orderkey") % 6 === 0).select("o_orderkey"),
        tag = "erase")
      q.processAllAvailable()
    } finally q.stop()
    VersionedTable.read(spark, dstRoot).orderBy("o_orderkey")
  }

  /** A reusable CDF → SCD2 applier for `foreachBatch` over a
    * `readChangeFeed` stream: each source commit's INSERT slice folds
    * into the silver history through the incremental
    * [[graft.operators.Cdc.scd2Merge]] (untouched keys pass as a
    * left-anti join; only touched keys replay), committed as one
    * rewrite per source version. Exactly-once under at-least-once
    * replay via the same two-layer gate as [[cdfApplier]]: a durable
    * per-stream high-water file (outlives tag retention) plus the
    * committed-tag ledger (`scd2-<v>`) covering the one version a
    * crash interleaves between commit and hwm write. DELETE slices
    * fail loudly — SCD2 folds an append-only event log; retracting
    * history needs a raw-source rebuild, not a silent drop.
    *
    * Matches the full batch rebuild whenever source commits partition
    * event time per key (the time-cut/append ingestion shape) — the
    * scd2Merge contract, and exactly what the stream_scd2 oracle pins.
    */
  private[graft] def scd2Applier(spark: SparkSession, silverRoot: String,
      keyCol: String, tsCol: String, attrCol: String,
      tieCols: Seq[String]): (DataFrame, Long) => Unit = {
    var applied: Set[String] = null
    var hwm = Long.MinValue
    (batch: DataFrame, _: Long) => {
      if (applied == null) {
        applied = VersionedTable.committedTags(spark, silverRoot)
        hwm = VersionedTable.readStreamHighWater(spark, silverRoot,
          "scd2").getOrElse(Long.MinValue)
      }
      batch.persist()
      try {
        val versions = batch.select(col("_commit_version")).distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { v =>
          val slice = batch.where(col("_commit_version") === v)
          if (v > hwm) {
            val tag = s"scd2-$v"
            if (!applied(tag)) {
              require(slice.where(col("_change_type") === "delete")
                  .isEmpty,
                "scd2Applier folds an append-only event log — a " +
                  s"DELETE slice arrived at source version $v; " +
                  "rebuild the history from the raw source instead")
              val delta = slice
                .where(col("_change_type") === "insert")
                .drop("_change_type", "_commit_version")
              if (!delta.isEmpty) {
                val merged = VersionedTable.latestVersion(spark,
                    silverRoot) match {
                  case None => graft.operators.Cdc.scd2(delta,
                    keyCol, tsCol, attrCol, tieCols)
                  case Some(sv) => graft.operators.Cdc.scd2Merge(
                    VersionedTable.readVersion(spark, silverRoot, sv),
                    delta, keyCol, tsCol, attrCol, tieCols)
                }
                VersionedTable.commit(merged, silverRoot, tag)
                applied += tag
              }
            }
            VersionedTable.writeStreamHighWater(spark, silverRoot,
              "scd2", v)
            hwm = v
          }
        }
      } finally { batch.unpersist(); () }
    }
  }

  /** Streaming CDF → SCD2 end-to-end — the lakehouse medallion shape
    * (bronze event table tails into a silver dimension history): raw
    * events land on a bronze graft table in three time-cut commits
    * (one before the stream starts, two WHILE it runs), the silver
    * side tails bronze's change feed and folds each commit through
    * [[scd2Applier]]. The silver history must equal the one-shot
    * batch [[graft.operators.Cdc.scd2]] over the whole log whatever
    * the micro-batch boundaries — the same oracle as scd2_history,
    * which is what pins it.
    */
  def runStreamScd2(spark0: SparkSession, dir: String,
      cut1: String = "2024-01-11", cut2: String = "2024-01-21")
      : DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/events.parquet"))
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val srcRoot = s"${graft.config.Scratch.runDir}/scd2_src_$tag"
    val silverRoot = s"${graft.config.Scratch.runDir}/scd2_silver_$tag"
    VersionedTable.destroy(spark, srcRoot)
    VersionedTable.destroy(spark, silverRoot)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_type"),
        col("event_id"))
    val t = col("ts").cast("date")
    VersionedTable.commit(ev.where(t < cut1), srcRoot, tag = "base")
    val applyFeed = scd2Applier(spark, silverRoot,
      "user_id", "ts", "event_type", tieCols = Seq("event_id"))
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(srcRoot)
      .writeStream.foreachBatch(applyFeed).start()
    try {
      q.processAllAvailable()
      VersionedTable.commitAppend(
        ev.where(t >= cut1 && t < cut2), srcRoot, tag = "delta1")
      q.processAllAvailable()
      VersionedTable.commitAppend(
        ev.where(t >= cut2), srcRoot, tag = "delta2")
      q.processAllAvailable()
    } finally q.stop()
    // the parquet roundtrip reads timestamps back as TIMESTAMP_NTZ
    // (session tz pinned UTC — same instants); unix_micros wants TZ
    VersionedTable.read(spark, silverRoot)
      .select(col("user_id"), col("version"), col("event_type"),
        unix_micros(col("valid_from").cast("timestamp"))
          .as("valid_from_us"),
        unix_micros(col("valid_to").cast("timestamp"))
          .as("valid_to_us"),
        col("is_current"))
      .orderBy("user_id", "version")
  }

  def runStreamingTableIngest(spark0: SparkSession, dir: String,
      cut: String = "2024-01-16"): DataFrame = {
    val spark = StreamSessions.streamSession(spark0,
      Seq(s"$dir/events.parquet"))
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val staged = Paths.get(
      s"${graft.config.Scratch.runDir}/ingest_stream_$tag")
    val tableRoot = s"${graft.config.Scratch.runDir}/ingest_table_$tag"
    stageTwoBatches(spark, dir, staged, cut,
      cols = Seq("event_id", "ts", "user_id", "event_type", "value"))
    VersionedTable.destroy(spark, tableRoot)
    val stream = spark.readStream
      .schema(spark.read.parquet(staged.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
    val q = stream.writeStream
      .foreachBatch(ingestSink(spark, tableRoot))
      .start()
    try q.processAllAvailable() finally q.stop()
    VersionedTable.read(spark, tableRoot)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy("event_type")
  }
}

