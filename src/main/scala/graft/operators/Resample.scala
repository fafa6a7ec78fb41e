package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a per-key daily grid and forward-fill gaps with the last observed
  * value — the standard prep before windowed feature extraction or
  * drift scoring over calendar time.
  *
  * Scale shape: the day grid is generated per key from that key's own
  * [first, last] span (`sequence` + explode — no driver calendar), the
  * observed side is one groupBy to day granularity, and the fill is a
  * running `last(ignoreNulls)` window over the key. Every exchange is
  * keyed by the entity key (two key-local shuffles, plan-gated in the
  * spec — never a global repartition or single-partition sort); window
  * state is bounded by days per key.
  */
object Resample {

  /** Daily grid + forward fill. Output: key, day, v_ffill (last
    * observed value at or before the day; null until the first
    * observation), is_observed (1 where the day had a real event).
    * Last-of-day pick is deterministic: max (timestamp, value) struct.
    */
  def dailyForwardFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        unix_micros(col(tsCol)).as("ts_us"), col(valueCol).as("v"))
      .groupBy(col(keyCol), col("day"))
      .agg(max(struct(col("ts_us"), col("v"))).getField("v").as("v"))
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(keyCol),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ffill"),
        col("v").isNotNull.cast("int").as("is_observed"))
      .orderBy(keyCol, "day")
  }
}
