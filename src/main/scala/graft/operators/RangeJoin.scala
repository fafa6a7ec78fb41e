package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — match each point row to the
  * interval rows of the same key that contain its timestamp. Spark
  * plans a raw `t BETWEEN start AND end` predicate as a broadcast
  * nested-loop join (all-pairs compute); the scalable shape used here
  * is fixed-granularity time bucketing: every interval explodes to the
  * buckets it covers, every point has exactly one bucket, and the join
  * becomes an EQUI-join on (key, bucket) followed by the exact
  * containment filter. Each (point, interval) match surfaces exactly
  * once — a point lives in one bucket — so no distinct pass is needed.
  *
  * Pick `granularityUs` near the typical interval length: shorter
  * granularity multiplies interval replication (span/granularity
  * buckets per interval), longer granularity widens buckets and lets
  * more non-matches through to the filter.
  */
object RangeJoin {

  /** All columns of both sides for each containment match; the caller
    * guarantees the two sides share no column names.
    */
  def pointInInterval(points: DataFrame, pointKey: String, pointTs: String,
      intervals: DataFrame, intervalKey: String, startCol: String,
      endCol: String, granularityUs: Long): DataFrame = {
    require(granularityUs > 0, "granularity must be positive")
    val iv = intervals.withColumn("__b",
      explode(sequence(floor(col(startCol) / granularityUs).cast("long"),
        floor(col(endCol) / granularityUs).cast("long"))))
    val pt = points.withColumn("__b",
      floor(col(pointTs) / granularityUs).cast("long"))
    pt.join(iv,
        pt(pointKey) === iv(intervalKey) && pt("__b") === iv("__b") &&
          col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__b")
  }
}
