package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed parquet table layout — shuffle paid ONCE at write time so
  * every later co-keyed join or aggregation plans with zero runtime
  * Exchange on that key. This is the storage-side half of the 100 TB
  * join strategy: a fact table bucketed on its join key meets an
  * equally-bucketed dimension in a SortMergeJoin whose both sides read
  * straight from disk — no shuffle of the big side, ever, across every
  * query that joins on the bucket key. Bucket counts must match
  * between tables meant to be co-located (Spark joins bucketed tables
  * shuffle-free only when the bucket counts are equal or multiples).
  *
  * `saveAsTable` with an explicit `path` keeps the data external (the
  * catalog entry is just metadata over the parquet files); bucketing
  * requires the catalog because bucket layout is a table property,
  * not something a bare `parquet(path)` write can record.
  */
object BucketedTable {

  /** Write `df` as a parquet-backed bucketed table (bucketed AND
    * sorted by `key`) registered as `table` with files at `path`.
    */
  def write(df: DataFrame, table: String, path: String, key: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket keys. The plan is a
    * SortMergeJoin with NO Exchange on either side (gated in
    * ScaleTechniquesSpec) — the join cost is the two scans.
    */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
