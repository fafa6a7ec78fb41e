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

  /** As-of join with a DIRECTION — the full pandas-`merge_asof`
    * surface: `backward` (latest right at-or-before, like
    * [[asofJoin]]), `forward` (earliest right at-or-after), `nearest`
    * (the closer of the two; an exact-distance tie prefers backward).
    * Same union-then-window shape; both direction frames are RANGE
    * frames over the epoch column, so ONE key shuffle and ONE sort
    * serve backward and forward simultaneously — `nearest` costs the
    * same single shuffle as either direction alone.
    *
    * Output: left columns + `valueCol` (the matched right value) +
    * `matched_ts` (the matched right row's epoch) — both NULL when no
    * right row qualifies in the direction.
    */
  def asofJoinDirectional(left: DataFrame, leftKey: String,
      leftTs: String, right: DataFrame, rightKey: String,
      rightTs: String, valueCol: String,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest: $direction")
    val reserved = Set("__k", "__t", "__side", "__v", "__row", "__b",
      "__f", valueCol, "matched_ts")
    val clashes = left.columns.filter(reserved.contains)
    require(clashes.isEmpty,
      s"asofJoinDirectional: left columns ${clashes.mkString(", ")} " +
        "collide with internal names — rename them before joining")
    val vType = right.schema(valueCol).dataType
    val leftRow = struct(left.columns.map(col).toSeq: _*)
    val l = left.select(col(leftKey).as("__k"),
      col(leftTs).cast("long").as("__t"), lit(1).as("__side"),
      lit(null).cast(vType).as("__v"), leftRow.as("__row"))
    val r = right.select(col(rightKey).as("__k"),
      col(rightTs).cast("long").as("__t"), lit(0).as("__side"),
      col(valueCol).as("__v"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    // the match payload is null on left rows so ignoreNulls windows
    // skip them; range frames keyed on __t make equal-timestamp right
    // rows inclusive in BOTH directions under one sort order
    val mv = when(col("__side") === 0,
      struct(col("__t").as("mt"), col("__v").as("v")))
    val wB = Window.partitionBy("__k").orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__k").orderBy(col("__t"))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val withBoth = l.unionByName(r)
      .withColumn("__b", last(mv, ignoreNulls = true).over(wB))
      .withColumn("__f", first(mv, ignoreNulls = true).over(wF))
    val chosen = direction match {
      case "backward" => col("__b")
      case "forward"  => col("__f")
      case "nearest" =>
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(col("__t") - col("__b.mt") <=
            col("__f.mt") - col("__t"), col("__b"))
          .otherwise(col("__f"))
    }
    withBoth
      .where(col("__side") === 1)
      .select((left.columns.map(c => col(s"__row.`$c`").as(c)) :+
        chosen.getField("v").as(valueCol) :+
        chosen.getField("mt").as("matched_ts")).toSeq: _*)
  }
}
