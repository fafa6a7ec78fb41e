package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for joins whose key distribution is hot: classic key
  * salting. The build side is replicated saltFactor times, the probe
  * side scatters each row to one random replica, and the join runs on
  * (key, salt) — a hot key's rows spread over saltFactor reducers
  * instead of one. Complements AQE's skew-join splitting (which works
  * per-partition after the fact); salting is for keys so hot that a
  * single key exceeds a partition.
  */
object Skew {

  /** Inner-join left (large, possibly skewed) with right (smaller,
    * replicable) on `key`, salted `saltFactor` ways.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, seed: Long = 42L): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt",
      floor(rand(seed) * saltFactor).cast("int"))
    val replicated = right
      .withColumn("__salt",
        explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
