package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session scoping for the STREAMING query family (optimization r19,
  * guide §2.2/§2.4 applied to state stores).
  *
  * Structured Streaming pins its state-store count to
  * `spark.sql.shuffle.partitions` at query start, and the engine
  * sessions set that conf to the host's CORE count — so every
  * stateful operator ran one state store (delta file, snapshot
  * lifecycle, commit participant) PER CORE per micro-batch while the
  * per-batch data stayed constant. The r18 driver's 8-vs-32-core
  * sweep measured the consequence: the whole streaming family
  * ANTI-scaled (ratios 0.05-0.21 — 32 cores slower than 8), because
  * per-micro-batch state/commit overhead grew linearly with cores
  * on a contended box.
  *
  * State partitions must track DATA, not the box. Streaming queries
  * therefore run in a child session whose shuffle-partition count
  * derives from the stream's INPUT SIZE: one partition per
  * `BytesPerPartition` of input, clamped to [MinParts, MaxParts].
  * Calibration (r19, local[32], this repo's bounded replays): at
  * sf0.1 (2 MB events) the family timed within noise anywhere in
  * 4-32 partitions (35.2-37.1 s over 16 queries), while at 10x data
  * (16 MB events) 32 partitions beat 8 by 1.9x (23.9 s vs 45.7 s
  * over the 5 heaviest) — the per-batch work is compute-bound, so
  * partitions must grow with batch rows, and 512 KiB of compressed
  * input per partition reproduces the measured optimum at both
  * scales. A production deployment overrides the knob (conf or env)
  * exactly as it would size `spark.sql.shuffle.partitions` for
  * batch; the point the default preserves is that a WIDER box alone
  * never multiplies state-store count.
  *
  * The child session shares the SparkContext (same cores, same
  * scheduler — scan parallelism is unchanged; only the post-shuffle
  * partition count moves), so this is an engine setting, not a
  * harness change.
  */
object StreamSessions {
  val ConfKey = "spark.graft.stream.statePartitions"
  val EnvKey = "SPARK_GRAFT_STREAM_PARTS"
  val BytesPerPartition = 512L * 1024
  val MinParts = 4
  val MaxParts = 512

  private def sizeOf(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) 0L
    else if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    } else java.nio.file.Files.size(p)
  }

  /** Data-proportional state-partition count for a stream whose
    * bounded replay reads `inputPaths` (files or directories).
    */
  def statePartitions(spark: SparkSession,
      inputPaths: Seq[String]): Int =
    sys.env.get(EnvKey)
      .orElse(spark.conf.getOption(ConfKey))
      .map(_.toInt)
      .getOrElse {
        val bytes = inputPaths.map(sizeOf).sum
        val p = (bytes + BytesPerPartition - 1) / BytesPerPartition
        math.min(MaxParts, math.max(MinParts, p)).toInt
      }

  /** A child session (shared context, own SQL conf) whose shuffle —
    * and therefore state-store — partition count is data-derived.
    * Every streaming runner builds its stream, sinks, and result
    * through this session.
    */
  def streamSession(spark: SparkSession,
      inputPaths: Seq[String]): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions",
      statePartitions(spark, inputPaths).toString)
    ss
  }
}
