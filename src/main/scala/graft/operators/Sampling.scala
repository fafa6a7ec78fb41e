package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row sampling (whiteRRabbit.R:225-272).
  *
  * The reference draws exactly maxRows distinct line numbers and
  * pre-filters them with awk so unsampled lines are never parsed; it is
  * unseeded. Here exact-k uniform sampling is `orderBy(rand(seed))
  * .limit(k)`, which Spark plans as TakeOrderedAndProject: each
  * partition keeps its local top-k by the random key, then the driver
  * merges k-sized heaps — no full shuffle and no global sort
  * materialization, so it holds at 100 TB (cost: one scan + k·P heap
  * entries). A seed makes runs reproducible (engine improvement over
  * the reference, SURVEY §7.4.8).
  */
object Sampling {

  /** Exactly min(k, n) uniformly-sampled rows, reproducible per seed. */
  def exactK(df: DataFrame, k: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__rand", rand(seed))
      .orderBy(col("__rand"))
      .limit(k)
      .drop("__rand")

  /** Head-k, the reference's non-random path (whiteRRabbit.R:242,:257). */
  def headK(df: DataFrame, k: Int): DataFrame = df.limit(k)

  /** Exactly min(k, group size) uniformly-sampled rows PER GROUP —
    * the data-mixing primitive of a training pipeline (balance sources
    * / languages / quality buckets before sampling). A per-group rank
    * over a seeded random key; the min_cell-style rank window holds one
    * group per partition, so for very hot groups pre-thin with a
    * Bernoulli `sample(fraction)` sized from approximate group counts
    * before the exact rank (same two-level shape as Frequency's
    * bounded top-K).
    */
  def stratifiedExactK(df: DataFrame, groupCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__rand"))
    df.withColumn("__rand", rand(seed))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rand", "__rn")
  }

  /** Exactly min(k, n) rows sampled WITHOUT replacement with
    * probability proportional to a positive weight column — the
    * "sample by quality score" primitive of a training-data mix.
    * Efraimidis-Spirakis A-Res: each row draws key u^(1/w) for
    * u ~ U(0,1) and the k largest keys win; the result is exactly a
    * weighted sample without replacement. Plans as
    * TakeOrderedAndProject like [[exactK]] — per-partition top-k
    * heaps, no full shuffle, holds at any scale. Rows with
    * non-positive or NULL weight are excluded (they would never be
    * drawn).
    */
  def weightedExactK(df: DataFrame, weightCol: String, k: Int,
      seed: Long = 42L): DataFrame =
    df.where(col(weightCol) > 0)
      .withColumn("__key",
        pow(rand(seed), lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__key").desc)
      .limit(k)
      .drop("__key")

  /** Deterministic train/validation/test splitting by key hash — the
    * assignment every training-data pipeline needs to be REPRODUCIBLE
    * and stable under reruns, appends, and repartitioning (unlike
    * `randomSplit`, whose assignment depends on partition layout). The
    * key is mixed with THREE iterated MINSTD Lehmer steps,
    * h ← (h·48271) mod (2^31−1) — one step leaves small ids
    * un-wrapped (id·48271 < 2^31 maps every small key below the first
    * cut); three spread any key range across the full interval. The
    * arithmetic stays inside BIGINT, so it is ANSI-safe in Spark and
    * replayable verbatim in a SQL oracle; the unit interval
    * h/(2^31−1) is cut at the cumulative split fractions.
    *
    * A pure projection: no shuffle, no state; the split column
    * partitions downstream writes (`partitionBy("split")`).
    *
    * @param splits (name, fraction) pairs summing to ~1; the last
    *   split absorbs rounding.
    */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val m = 2147483647L // 2^31 - 1
    val h = (1 to 3).foldLeft(col(idCol).cast("long")) {
      (acc, _) => pmod(acc * lit(48271L), lit(m))
    }
    val u = h.cast("double") / lit(m.toDouble)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(cuts).init.foldRight(
      lit(splits.last._1): org.apache.spark.sql.Column) {
      case (((name, _), cut), rest) => when(u < cut, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** The reference's row-cap policy: sample only when the table exceeds
    * maxRows (whiteRRabbit.R:225-272). The reference caps only for
    * maxRows > 0 (whiteRRabbit.R:225,:259,:268), so 0 and negative both
    * mean "all rows" — limit(0) would silently empty the table.
    */
  def cap(df: DataFrame, maxRows: Long, randomSample: Boolean,
      seed: Long = 42L): DataFrame =
    if (maxRows <= 0) df
    else {
      require(maxRows <= Int.MaxValue,
        s"maxRows $maxRows exceeds Int.MaxValue; use maxRows <= 0 for all rows")
      if (randomSample) exactK(df, maxRows.toInt, seed)
      else headK(df, maxRows.toInt)
    }
}
