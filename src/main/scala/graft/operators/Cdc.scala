package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives for incremental 100 TB pipelines:
  * snapshot-to-snapshot diffs (what changed between two loads) and
  * SCD type-2 history build (when did each key's attribute change and
  * how long was each version valid).
  *
  * Both are single-shuffle shapes: [[snapshotDiff]] is one full-outer
  * sort-merge join on the key, [[scd2]] is two windows over ONE
  * partitioning of the key — no driver state, no all-pairs work, state
  * bounded by rows-per-key.
  */
object Cdc {

  /** Classify every key as insert / update / delete between two
    * snapshots of the same table. `update` means at least one of
    * `compareCols` differs null-safely; unchanged keys are dropped
    * (at 100 TB the unchanged majority never leaves the join).
    *
    * Output: key columns (coalesced from both sides), `action`,
    * `n_changed` (how many compared columns differ; 0 for
    * insert/delete rows — their whole row appeared or vanished).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    val cols = keyCols ++ compareCols
    val o = oldDf.select(cols.map(col): _*).toDF(cols.map("o_" + _): _*)
    val n = newDf.select(cols.map(col): _*).toDF(cols.map("n_" + _): _*)
    val joinCond = keyCols.map(k => col("o_" + k) === col("n_" + k))
      .reduce(_ && _)
    val oldKey = col("o_" + keyCols.head)
    val newKey = col("n_" + keyCols.head)
    val nChanged: Column = compareCols.map { c =>
      when(!(col("o_" + c) <=> col("n_" + c)), 1).otherwise(0)
    }.reduceOption(_ + _).getOrElse(lit(0))
    o.join(n, joinCond, "full_outer")
      .withColumn("action",
        when(oldKey.isNull, lit("insert"))
          .when(newKey.isNull, lit("delete"))
          .when(nChanged > 0, lit("update")))
      .where(col("action").isNotNull)
      .withColumn("n_changed",
        when(col("action") === "update", nChanged).otherwise(0))
      .select(keyCols.map(k =>
        coalesce(col("o_" + k), col("n_" + k)).as(k)) ++
        Seq(col("action"), col("n_changed")): _*)
      .orderBy(col("action") +: keyCols.map(col): _*)
  }

  /** Apply a new event batch to an existing SCD2 history WITHOUT
    * rebuilding untouched keys — the incremental path that keeps a
    * 100 TB dimension table fresh per micro-batch. Keys absent from
    * the delta keep their history rows verbatim (a left-anti join);
    * only touched keys replay, and their replay input is the
    * history's change points (one row per version) unioned with the
    * delta rows, re-sorted.
    *
    * Equals [[scd2]] over the full log when batches PARTITION EVENT
    * TIME (every delta event at or after the base log's events for
    * that key — what any time-cut/append ingestion gives you). A
    * delta older than that can still merge correctly when it only
    * crosses retained change points (the spec covers one), but a
    * delta landing inside a base run whose later same-attribute
    * events were dropped as no-ops is unrecoverable from history
    * alone — those keys need a raw-source rebuild, the standard SCD2
    * late-arrival limitation.
    *
    * `history` must carry the [[scd2]] output shape; the original tie
    * values are lost at version granularity, so replayed change points
    * carry `version − 2^62` as their tie value: hugely negative, they
    * sort FIRST among equal timestamps (matching their origin as the
    * earliest event at that timestamp) while staying in ORIGINAL
    * version order when two change points of one key share a
    * `valid_from` — a null tie would make that replay order
    * nondeterministic.
    */
  def scd2Merge(history: DataFrame, delta: DataFrame, keyCol: String,
      tsCol: String, attrCol: String, tieCols: Seq[String] = Nil)
      : DataFrame = {
    val touched = delta.select(col(keyCol)).distinct()
    val untouched = history.join(touched, Seq(keyCol), "left_anti")
    val replayBase = history.join(touched, Seq(keyCol), "left_semi")
      .select(Seq(col(keyCol), col("valid_from").as(tsCol),
        col(attrCol)) ++
        tieCols.map(t => (col("version").cast("long") -
          lit(1L << 62)).as(t)): _*)
    val replayDelta = delta
      .select((Seq(keyCol, tsCol, attrCol) ++ tieCols).map(col): _*)
    val rebuilt = scd2(replayBase.unionByName(replayDelta),
      keyCol, tsCol, attrCol, tieCols)
    untouched.unionByName(rebuilt)
  }

  /** Build an SCD type-2 history from an event log: per key, rows
    * where `attrCol` null-safely differs from its previous value open
    * a new version; `valid_from` is that event's time, `valid_to` the
    * next version's start (null = still current).
    *
    * Ordering within a key is (tsCol, tieCols...) — pass a unique
    * tie-break column when timestamps can collide, or the history is
    * not deterministic. Both the change-detection lag and the
    * validity lead ride the SAME key partitioning, so the whole build
    * is one shuffle.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
      attrCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val changed = df
      .select((Seq(keyCol, tsCol, attrCol) ++ tieCols).map(col): _*)
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      .where(col("_first") || !(col("_prev") <=> col(attrCol)))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0))
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
