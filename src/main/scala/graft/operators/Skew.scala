package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling for joins whose key distribution is hot: TWO-PATH key
  * salting (VERDICT r4 #3). Hot keys are detected from a sampled
  * per-key count; only rows with hot keys are salted — the probe side
  * scatters each hot row to one of `saltFactor` replicas and the build
  * side replicates its hot rows `saltFactor` times — while the cold
  * majority takes a plain un-replicated join. The two paths union.
  *
  * Why two-path: salting everything replicates the ENTIRE build side
  * ×saltFactor, so a 10× bigger dimension pays 10×saltFactor more
  * build rows whether or not any key is hot. Detection costs one
  * sampled scan of the key column (plus one tiny job over the sampled
  * counts); the hot-key list is bounded by totalRows/threshold — at
  * the default threshold of 2 partitions' worth of rows per key, at
  * most shufflePartitions/2 keys — and is applied as a broadcast-style
  * `isin` predicate, never a join.
  *
  * Complements AQE's skew-join splitting (which splits oversized
  * partitions after the fact); explicit salting is for keys so hot
  * that a single key exceeds a partition even after AQE splits.
  */
object Skew {

  /** Keys with (estimated) more rows than this many partitions' worth
    * of data are salted. 2 partitions: AQE already handles mild skew;
    * salting targets keys that dominate a reducer outright.
    */
  private val HotPartitionsFactor = 2.0

  /** Cap on the collected hot-key list (keeps the `isin` predicate and
    * driver memory bounded under a caller-supplied low threshold); the
    * hottest keys win.
    */
  private val MaxHotKeys = 10000

  /** Inner-join left (large, possibly skewed) with right (smaller,
    * replicable) on `key`, salting only the hot keys.
    *
    * @param hotKeyThreshold a key is hot if it has at least this many
    *   left rows; None = auto (HotPartitionsFactor partitions' worth)
    * @param sampleFraction fraction of left's key column scanned for
    *   hot-key detection (1.0 = exact counts)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, seed: Long = 42L,
      hotKeyThreshold: Option[Long] = None,
      sampleFraction: Double = 0.01): DataFrame = {
    require(saltFactor > 0 && sampleFraction > 0 && sampleFraction <= 1.0)
    val spark = left.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // sampled per-key counts; partial (map-side) aggregation keeps this
    // skew-safe — the hot key reduces to one row per map task
    val sampled =
      if (sampleFraction >= 1.0) left.select(col(key))
      else left.select(col(key)).sample(sampleFraction, seed)
    val counts = sampled.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
    val sampleTotal = counts.agg(sum("__cnt")).head().getLong(0)
    val estimatedRows = (sampleTotal / sampleFraction).toLong
    val threshold = hotKeyThreshold.getOrElse(
      math.max(1L, (HotPartitionsFactor * estimatedRows / parts).toLong))
    val sampleCut = math.max(1.0, threshold * sampleFraction)
    val hotKeys = counts.where(col("__cnt") >= sampleCut)
      .orderBy(desc("__cnt")).limit(MaxHotKeys)
      .select(col(key)).collect().map(_.get(0)).toSeq

    if (hotKeys.isEmpty) left.join(right, Seq(key))
    else {
      val isHot = col(key).isin(hotKeys: _*)
      val saltedLeft = left.where(isHot).withColumn("__salt",
        floor(rand(seed) * saltFactor).cast("int"))
      val replicated = right.where(isHot).withColumn("__salt",
        explode(sequence(lit(0), lit(saltFactor - 1))))
      val hot = saltedLeft.join(replicated, Seq(key, "__salt"))
        .drop("__salt")
      // cold path: plain join, nothing replicated
      val cold = left.where(!isHot).join(right.where(!isHot), Seq(key))
      cold.unionByName(hot)
    }
  }
}
