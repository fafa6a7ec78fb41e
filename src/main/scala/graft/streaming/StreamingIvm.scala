package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ivm

/** Streaming incremental view maintenance: a `foreachBatch` sink that
  * folds each micro-batch's [[Ivm.aggState]] into a persistent state
  * table, so the rollup stays fresh per batch while only state-sized
  * data (|keys| rows) is ever rewritten — the raw stream is read once
  * and never again. Because every state component is a commutative
  * monoid, the final state is independent of batch boundaries and
  * arrival order, and equals the batch recompute over the whole log —
  * which is exactly what the contract oracle pins.
  *
  * The state lives as parquet versions swapped atomically (write next,
  * move over current) — the same pattern a production job would use on
  * object storage with a manifest.
  */
object StreamingIvm {

  /** Replay the events log as a TWO-micro-batch file stream (split at
    * `cut`, one file per half, maxFilesPerTrigger=1), maintain the
    * per-event-type state across batches, and return the finalized
    * rollup joined with the exact distinct-user count (the HLL
    * tolerance flag convention of `hll_rollup`/`ivm_merge`).
    */
  def runStreamingIvm(spark: SparkSession, dir: String,
      cut: String = "2024-01-16"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val keys = Seq("event_type")
    val tag = java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL)
    val staged = Paths.get(s"${graft.config.Scratch.dir}/ivm_stream_$tag")
    val stateRoot = s"${graft.config.Scratch.dir}/ivm_state_$tag"
    val cur = Paths.get(s"$stateRoot/cur")

    // stage the two "arriving" batch files deterministically — RAW
    // columns (ts stays nanos-long) so the stream schema matches;
    // always restage so a stale layout can't leak across code versions
    if (Files.exists(staged)) {
      Files.walk(staged).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    locally {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      val t = expr("timestamp_micros(ts DIV 1000)")
      ev.where(t < cut).coalesce(1)
        .write.mode("overwrite").parquet(s"$staged/b0")
      ev.where(t >= cut).coalesce(1)
        .write.mode("overwrite").parquet(s"$staged/b1")
      val files = Seq("b0", "b1").flatMap { b =>
        val d = Paths.get(s"$staged/$b")
        val fs = Files.list(d).toArray.map(_.toString)
          .filter(_.endsWith(".parquet"))
        fs
      }
      files.zipWithIndex.foreach { case (f, i) =>
        Files.move(Paths.get(f), staged.resolve(s"part$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      Seq("b0", "b1").foreach { b =>
        val d = Paths.get(s"$staged/$b")
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
    // fresh state per run (reruns must not double-count)
    if (Files.exists(Paths.get(stateRoot))) {
      Files.walk(Paths.get(stateRoot))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }

    val stream = spark.readStream
      .schema(StreamingProfile.eventsRawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val st = Ivm.aggState(batch, keys, "value", "user_id")
        val merged =
          if (Files.exists(cur))
            Ivm.merge(Seq(spark.read.parquet(cur.toString), st), keys)
          else st
        val next = s"$stateRoot/next"
        merged.write.mode("overwrite").parquet(next)
        // swap: the state version flip a manifest would make atomic
        if (Files.exists(cur)) {
          Files.walk(cur).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
        }
        Files.move(Paths.get(next), cur)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    Ivm.finalizeState(spark.read.parquet(cur.toString), keys)
      .join(exact, "event_type")
      .select(col("event_type"), col("n"), col("sum_v"), col("min_v"),
        col("max_v"), col("avg_v"), col("n_exact"),
        (abs(col("n_distinct_est") - col("n_exact")) /
          col("n_exact") <= 0.05).cast("int").as("within_5pct"))
      .orderBy("event_type")
  }
}
