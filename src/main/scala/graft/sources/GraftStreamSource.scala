package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** A graft versioned table as a Structured Streaming SOURCE — the
  * read half of the lakehouse streaming story ([[GraftDataSource]]'s
  * `foreachBatch`-driven ingest being the write half): `spark
  * .readStream.format("graft").load(root)` emits the table's rows as
  * they are committed, offsets are VERSION IDS (one `LongOffset` per
  * snapshot, checkpoint-recoverable via the engine's serialized-
  * offset path), and each micro-batch reads exactly the delta
  * directories the covered versions appended — never a snapshot-sized
  * rescan, which is what makes tailing a 100 TB table cheap.
  *
  * Semantics (Delta streaming-source rules):
  *   - the FIRST batch is the full snapshot of the table as of the
  *     stream's start (or of `startingVersion`'s predecessor-free
  *     delta chain when the option names a later version — "new rows
  *     only" tailing);
  *   - subsequent batches are [[VersionedTable.appendDelta]] ranges:
  *     a REWRITE in range fails the stream loudly (its rows are not
  *     expressible as an append), a merge-on-read DELETE fails unless
  *     `ignoreDeletes` (deletions then simply don't stream);
  *   - metadata-only commits (schema evolution, refs) advance the
  *     offset with zero rows, and deltas project through the newest
  *     field mapping onto the stream's declared schema;
  *   - vacuum expiring a checkpointed offset's manifest fails the
  *     restart loudly (pin retention to the streaming restart window,
  *     the same contract the high-water-mark files document);
  *   - `readChangeFeed` switches to the CHANGE DATA FEED
  *     ([[VersionedTable.changeDelta]]): inserts AND merge-on-read
  *     delete keys stream, each row tagged `_change_type` and
  *     `_commit_version` — the CDC-replication shape.
  */
class GraftStreamSource(sqlContext: SQLContext, root: String,
    startingVersion: Long, ignoreDeletes: Boolean,
    changeFeed: Boolean,
    override val schema: StructType,
    maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    pinOffsets: Boolean = false,
    metadataPath: String = "") extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private def spark = sqlContext.sparkSession

  // an offset arrives either as our own LongOffset or as the
  // engine's checkpoint-recovered SerializedOffset (json = the long)
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  // ---- rate limiting (maxVersionsPerTrigger) ----
  // The highest version this source has PLANNED into a batch so far.
  // Durable as a tiny floor file beside the engine's own source
  // metadata, so a RESTART against a 10,000-commit backlog still
  // paces N versions per micro-batch instead of planning one giant
  // batch (the floor only bounds batch SIZE — batch CONTENT always
  // comes from the engine's checkpointed offsets, so an overshot
  // floor after a crash merely makes one batch larger, never wrong).
  private var lastPlanned: Option[Long] = None
  private var floorSeeded = false

  private def floorPath = new org.apache.hadoop.fs.Path(
    metadataPath, "graft-rate-floor")

  private def hadoopFs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seededPlanned(): Option[Long] = {
    if (!floorSeeded) {
      floorSeeded = true
      if (lastPlanned.isEmpty && metadataPath.nonEmpty) {
        val p = floorPath
        val f = hadoopFs(p)
        if (f.exists(p)) {
          val in = f.open(p)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim finally in.close()
          lastPlanned = s.toLongOption
        }
      }
    }
    lastPlanned
  }

  private def persistFloor(v: Long): Unit = {
    lastPlanned = Some(v)
    if (metadataPath.nonEmpty) {
      val p = floorPath
      val out = hadoopFs(p).create(p, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** The newest committed version — nothing to emit until the table
    * has one at or above `startingVersion`. With
    * `maxVersionsPerTrigger = N` the offered offset is capped at N
    * versions past the last planned one, and `maxBytesPerTrigger`
    * additionally stops extending the batch once the versions'
    * manifest-listed delta bytes reach the cap (always at least one
    * version — progress over strictness, the Delta rule) — so a deep
    * commit backlog (or a restart into one) drains as a sequence of
    * bounded micro-batches. The default-start INITIAL SNAPSHOT stays
    * one batch by construction (a snapshot is not expressible as
    * version slices). The byte walk only lists the directories of
    * versions entering THIS batch, never the whole backlog.
    */
  override def getOffset: Option[Offset] = nextOffset(None, None)

  private def nextOffset(knownBase: Option[Long],
      cap: Option[Long]): Option[LongOffset] = {
    val latest = VersionedTable.latestVersion(spark, root)
      .filter(_ >= startingVersion)
      .map(v => cap.fold(v)(math.min(v, _)))
    if (maxVersionsPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      return latest.map(LongOffset(_))
    latest.map { v =>
      val base = knownBase.orElse(seededPlanned()).orElse(
        if (startingVersion > 0) Some(startingVersion - 1) else None)
      val end = base match {
        case None => v // initial snapshot: one batch by construction
        case Some(b) if b >= v => v
        case Some(b) =>
          val capV = maxVersionsPerTrigger
            .map(n => math.min(v, b + n)).getOrElse(v)
          maxBytesPerTrigger match {
            case None => capV
            case Some(maxB) =>
              var e = b + 1
              var acc = VersionedTable.deltaBytes(spark, root, e)
              while (e < capV && acc < maxB) {
                e += 1
                acc += VersionedTable.deltaBytes(spark, root, e)
              }
              e
          }
      }
      if (lastPlanned.forall(_ < end)) persistFloor(end)
      LongOffset(end)
    }
  }

  // ---- admission control / Trigger.AvailableNow ----
  // The engine drives a SupportsAdmissionControl source through
  // latestOffset(start, limit) instead of getOffset — `start` is the
  // previous batch's end, the exact pacing base (the durable floor
  // file stays as the fallback for the null first call). Under
  // Trigger.AvailableNow the run is additionally CAPPED at the head
  // observed in prepareForTriggerAvailableNow, so the query drains
  // the backlog in paced micro-batches and then stops on its own —
  // without this, the engine falls back to one giant single batch.
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = VersionedTable.latestVersion(spark, root)
      .filter(_ >= startingVersion)
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit
      .allAvailable() // version/byte caps are applied internally

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    nextOffset(Option(start).map {
      case l: LongOffset => l.offset
      case other => other.json.trim.toLong
    }, availableNowCap).orNull

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    VersionedTable.latestVersion(spark, root)
      .filter(_ >= startingVersion).map(LongOffset(_)).orNull

  // ---- offset pinning (pinOffsets) ----
  // A `stream_<id>` branch ref vacuum treats as a retention FLOOR:
  // the whole version suffix from the pin on survives
  // ([[VersionedTable.vacuum]]), so retention can never expire a
  // manifest a restart still needs. The pin moves at batch PLAN time
  // to the batch's start version (replaying THIS batch needs
  // everything after it; the engine only tells a V1 source about
  // durably committed offsets one batch late), and [[commit]]
  // advances it. Forward-only: a replayed older batch never drags
  // the pin back. The ref outlives the stream by design — a pin that
  // vanished with the process would not protect a
  // stopped-but-restartable stream; decommissioning a checkpoint
  // means dropping its ref ([[VersionedTable.dropRef]]).
  private val pinName = VersionedTable.streamPinName(
    if (metadataPath.nonEmpty) metadataPath else root)

  private def pinAt(v: Long): Unit = if (pinOffsets) {
    val cur = scala.util.Try(
      VersionedTable.resolveRef(spark, root, pinName)).toOption
    if (cur.forall(_ < v)) {
      if (cur.isDefined) VersionedTable.moveRef(spark, root, pinName, v)
      else VersionedTable.createRef(spark, root, pinName, v,
        movable = true)
    }
  }

  /** Offsets up to `end` are durably committed — advance the pin. */
  override def commit(end: Offset): Unit = pinAt(versionOf(end))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val endV = versionOf(end)
    // pin BEFORE reading: replaying this batch after a crash needs
    // every version from its start — for a tail-mode first batch
    // that is startingVersion-1 (the delta base actually walked),
    // for a snapshot first batch endV
    pinAt(start.map(versionOf).getOrElse(
      if (startingVersion > 0) startingVersion - 1 else endV))
    if (lastPlanned.forall(_ < endV)) lastPlanned = Some(endV)
    // the change feed ([[VersionedTable.changeDelta]]) emits inserts
    // AND delete keys tagged _change_type/_commit_version; the plain
    // feed emits appended rows only
    def delta(fromV: Long): DataFrame =
      if (changeFeed) VersionedTable.changeDelta(spark, root, fromV, endV)
      else VersionedTable.appendDelta(spark, root, fromV, endV,
        ignoreDeletes)
    val batch = start.map(versionOf) match {
      // steady state: exactly the changes versions (startV, endV] made
      case Some(startV) => delta(startV)
      // first batch, tailing from a named later version: the chain
      // from startingVersion's PREDECESSOR — new changes only
      case None if startingVersion > 0 => delta(startingVersion - 1)
      // first batch, default: the full initial snapshot (deletes
      // applied, mapping applied), exactly what a late-joining
      // consumer must see — under the change feed, as inserts at endV
      case None =>
        val snap = VersionedTable.readVersion(spark, root, endV)
        if (changeFeed)
          snap.withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(endV))
        else snap
    }
    // the stream's schema is FIXED at start; a mid-stream evolution
    // (rename/drop/add/widen) changes what the delta projects to, and
    // feeding drifted rows into a plan bound to the declared schema
    // would corrupt silently (positional rebind) or trip an opaque
    // engine assertion — align by name when only the ORDER moved,
    // fail with a restart hint on any name/type drift
    val got = batch.schema
    val byName = got.fields.map(f => f.name -> f.dataType).toMap
    require(got.fields.length == schema.fields.length &&
      schema.fields.forall(f => byName.get(f.name).contains(f.dataType)),
      s"table schema changed mid-stream at $root: the stream declared " +
        s"${schema.simpleString} but version $endV reads as " +
        s"${got.simpleString} — restart the stream to adopt the new " +
        "schema")
    val aligned = batch.select(schema.fieldNames.toIndexedSeq
      .map(n => org.apache.spark.sql.functions.col(
        "`" + n.replace("`", "``") + "`")): _*)
    org.apache.spark.sql.graft.StreamBridge.asStreamingFrame(aligned)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftStreamSource[$root, startingVersion=$startingVersion]"
}
