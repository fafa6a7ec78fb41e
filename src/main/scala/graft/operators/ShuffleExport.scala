package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffle — the training-data EXPORT step: every
  * epoch the corpus is re-ordered by a seeded permutation and cut into
  * shards so data-parallel readers stream disjoint, randomized slices.
  * Reproducibility is the contract (rerunning an epoch must yield the
  * byte-identical order: job retries, multi-framework consumers,
  * debugging a loss spike at step N), so the permutation key is a
  * seeded MINSTD hash chain — the repo's replayable-randomness
  * convention ([[Privacy.seededLaplace]]) — not `rand()`.
  *
  * Reference behavioral anchor: the reference samples rows with a
  * seeded RNG for reproducibility (`whiteRRabbit.R:229-263`); this
  * operator extends that seeded-determinism contract to full-corpus
  * ordering.
  */
object ShuffleExport {

  private val M = 2147483647L // 2^31 - 1
  private val A = 48271L      // MINSTD multiplier

  /** The seeded permutation key: three MINSTD rounds over (id + seed)
    * — mod-2³¹−1 arithmetic that any SQL engine replays exactly
    * (every intermediate fits a 64-bit signed integer).
    */
  def shuffleKey(id: Column, seed: Long): Column =
    (1 to 3).foldLeft(pmod(id + lit(seed), lit(M))) {
      (acc, _) => pmod(acc * lit(A), lit(M))
    }

  /** Assign every row a shard and a position within it:
    * `shard = key mod nShards`, `pos` = the key's rank inside the
    * shard (ties broken by id — the chain collides only when two ids
    * coincide mod 2³¹−1). Output (shard, pos, id), the manifest a
    * shard-writer consumes in order.
    *
    * Scale shape: ONE hash-partition exchange on `shard` plus a
    * per-shard sort — exactly the physical work any sharded export
    * must do (each output shard is written in its shuffled order), no
    * more. The window's partition count is `nShards`, so pick shards
    * ≫ executors at 100 TB (shards are usually thousands of files —
    * already true); shard sizes concentrate tightly around n/nShards
    * because the key chain is uniform, so no shard skews.
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val key = shuffleKey(col(idCol), seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key"), col(idCol))
    df.select(col(idCol), key.as("__key"))
      .withColumn("shard", pmod(col("__key"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col(idCol))
  }
}
