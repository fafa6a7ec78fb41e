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
    override val schema: StructType) extends Source {

  private def spark = sqlContext.sparkSession

  // an offset arrives either as our own LongOffset or as the
  // engine's checkpoint-recovered SerializedOffset (json = the long)
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  /** The newest committed version — nothing to emit until the table
    * has one at or above `startingVersion`.
    */
  override def getOffset: Option[Offset] =
    VersionedTable.latestVersion(spark, root)
      .filter(_ >= startingVersion).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val endV = versionOf(end)
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
