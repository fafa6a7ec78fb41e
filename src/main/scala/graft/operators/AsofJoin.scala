package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the value of the latest right row
  * with the same key and right time ≤ left time (inclusive). Spark has
  * no native as-of join; the classic distributed formulation used here
  * is union-then-window: tag both sides, union them into one dataset,
  * sort each key's timeline once, and carry the last non-null right
  * value forward. ONE shuffle (by key), no range join, no per-row
  * probing — at any scale this is a single repartition + ordered scan,
  * versus the O(|L|·|R|) inequality join a naive formulation plans.
  *
  * Ties: right rows sort before left rows at the same timestamp, so
  * the match is inclusive. Callers must make the right side unique per
  * (key, time) — e.g. pre-aggregate — for deterministic output.
  *
  * Skew: a key's whole timeline lands in one window partition. Keys
  * here are entities (users, instruments), whose event counts are
  * bounded in practice; a pathological key would call for range
  * bucketing by time with boundary stitching.
  */
object AsofJoin {

  /** Left columns + `valueCol` holding the as-of matched right value
    * (NULL when no right row precedes the left row).
    */
  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      valueCol: String): DataFrame = {
    val reserved = Set("__k", "__t", "__side", "__v", "__row", valueCol)
    val clashes = left.columns.filter(reserved.contains)
    require(clashes.isEmpty,
      s"asofJoin: left columns ${clashes.mkString(", ")} collide with " +
        s"internal names (__k/__t/__side/__v/__row) or valueCol " +
        s"'$valueCol' — rename them before joining")
    val vType = right.schema(valueCol).dataType
    val leftRow = struct(left.columns.map(col).toSeq: _*)
    val l = left.select(col(leftKey).as("__k"),
      col(leftTs).cast("long").as("__t"), lit(1).as("__side"),
      lit(null).cast(vType).as("__v"), leftRow.as("__row"))
    val r = right.select(col(rightKey).as("__k"),
      col(rightTs).cast("long").as("__t"), lit(0).as("__side"),
      col(valueCol).as("__v"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((left.columns.map(c => col(s"__row.`$c`").as(c)) :+
        col("__m").as(valueCol)).toSeq: _*)
  }
}
