package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — `row_number() OVER (ORDER BY ...)`
  * without the single-partition window it plans to by default.
  *
  * A global-ordered window in Spark moves EVERY row into one partition
  * (Catalyst warns "No Partition Defined for Window operation"), which
  * is the single worst scale trap in the window-function surface: fine
  * at 60k rows, a one-executor pile-up at 100 TB. The scalable shape is
  * the classic two-pass sort-merge rank:
  *
  *   1. range-repartition by the sort key (Spark's distributed sort —
  *      sampled boundaries, each partition holds a contiguous key
  *      range);
  *   2. count rows per partition (tiny: one row per partition);
  *   3. prefix-sum those counts into per-partition offsets (a window
  *      over partition-count rows, not data rows);
  *   4. rank locally within each partition and add the offset.
  *
  * The result is exact and deterministic whenever `order` is a TOTAL
  * order (no ties): any boundary the range sampler picks yields the
  * same global rank, because rank is a function of the ordering alone.
  * With ties, rows equal on the key may straddle a partition boundary
  * and their relative numbering follows the partitioning — pass a
  * tie-breaking column (an id) to make the order total, exactly as a
  * deterministic `row_number` would need anyway.
  */
object Ranking {

  /** `df` plus a `row_num` column (1-based global rank by `order`).
    *
    * `numPartitions` bounds per-partition sort size: at 100 TB pick
    * data-size/target-partition-size (the sf-test default of the
    * session's shuffle parallelism is fine at test scale).
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      numPartitions: Int): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one sort key")
    val pid = "__graft_pid"
    val cnt = "__graft_cnt"
    val off = "__graft_off"
    val ranged = df.repartitionByRange(numPartitions, order: _*)
      .withColumn(pid, spark_partition_id())
    // one row per partition; the offset prefix-sum window runs over
    // `numPartitions` rows, so its single partition is bounded by
    // configuration, never by data
    val offsets = ranged.groupBy(col(pid))
      .agg(count(lit(1)).as(cnt))
      .withColumn(off, coalesce(
        sum(col(cnt)).over(Window.orderBy(col(pid))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(pid), col(off))
    val local = Window.partitionBy(col(pid)).orderBy(order: _*)
    ranged.join(broadcast(offsets), Seq(pid))
      .withColumn("row_num",
        row_number().over(local).cast("long") + col(off))
      .drop(pid, off)
  }
}
