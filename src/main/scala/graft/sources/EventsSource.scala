package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive reader for the driver-generated `events` table.
  *
  * The driver has shipped `events.ts` under two different parquet
  * physical types across testdata generations: TIMESTAMP(NANOS)
  * (which Spark has no type for — readable only as a raw long via
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS)
  * without UTC adjustment (which Spark reads as TIMESTAMP_NTZ). Every
  * consumer in this repo wants the same thing regardless: `ts` as a
  * session-zone TimestampType at microsecond precision, exactly what
  * DuckDB's `epoch_us(ts)` sees on the oracle side. Centralizing the
  * branch here means a future regeneration changes one `case`, not a
  * dozen call sites.
  */
object EventsSource {

  /** Read `dir`/events.parquet with `ts` normalized to TimestampType
    * microseconds, whatever the file's physical type.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(readRaw(spark, dir))

  /** Read the file as-is (nanos files surface `ts` as a raw long).
    * The nanosAsLong flag is a no-op for micros files, so it is always
    * safe to set.
    */
  def readRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Normalize a `ts` column to session-zone TimestampType at
    * microsecond precision:
    *  - LongType: raw nanos from a TIMESTAMP(NANOS) file — truncate to
    *    micros (exactly DuckDB's `epoch_us` on the same file);
    *  - TIMESTAMP_NTZ: micros without zone — reinterpreted in the UTC
    *    session zone (value-identical micros);
    *  - TimestampType: already normalized.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        // integer DIV: a double division would lose precision above
        // 2^53, and epoch-nanos (~1.7e18) are already past it
        df.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` DIV 1000")))
      case TimestampNTZType =>
        // the NTZ→TimestampType cast reinterprets wall-clock micros in
        // the SESSION zone: value-identical only under UTC. Every
        // entry point pins UTC; assert rather than silently shift a
        // future caller's instants by their local offset
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts NTZ normalization requires a UTC session " +
            s"zone (got '$tz'): set spark.sql.session.timeZone=UTC")
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"unsupported events.$tsCol type: $other")
    }
}
