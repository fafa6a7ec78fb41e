package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Bridge to the private[sql] streaming-frame constructor: a V1
  * streaming source's `getBatch` must return a DataFrame whose plan
  * is tagged `isStreaming` (the engine refuses a batch plan inside a
  * streaming query), and the only way to build one is
  * `SparkSession.internalCreateDataFrame(..., isStreaming = true)` —
  * exactly what Spark's own file and Kafka V1 sources call.
  */
object StreamBridge {

  /** Re-tag a (lazy, distributed) batch frame as a streaming one:
    * the plan compiles to its own RDD — nothing materializes here —
    * and the RDD re-enters a streaming-tagged leaf.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
