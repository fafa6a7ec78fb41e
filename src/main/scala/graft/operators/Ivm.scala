package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance via mergeable partial-aggregate
  * states: aggregate each ingest batch ONCE into a compact per-key
  * state, then combine states without ever rescanning the base data —
  * the standard way to keep a 100 TB rollup fresh when batches arrive
  * hourly. All components are commutative monoids (count-sum, exact
  * DECIMAL sum, min, max, mergeable HLL sketch), so merging is
  * associative, order-free, and exactly equals a full recompute for
  * everything but the HLL estimate (whose error bound is unchanged by
  * merging).
  *
  * The state is itself a DataFrame — write it as a parquet "state
  * table" per batch and merging N batches is a union + one groupBy,
  * shuffling only |keys|-sized states, never raw rows.
  *
  * Deletes/retractions: counts and sums are abelian (feed the deleted
  * rows with negated measures); min/max and HLL are NOT retractable —
  * rebuild affected keys instead (the standard IVM limitation).
  */
object Ivm {

  /** Per-key mergeable state over one batch: row count, exact
    * DECIMAL(28,2) sum, min, max of `valueCol`, HLL sketch of
    * `distinctCol`. One aggregation pass over the batch.
    */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String,
      distinctCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("s_n"),
      sum(col(valueCol).cast("decimal(18,2)"))
        .cast("decimal(28,2)").as("s_sum"),
      min(col(valueCol)).as("s_min"),
      max(col(valueCol)).as("s_max"),
      hll_sketch_agg(col(distinctCol)).as("s_hll"))

  /** Merge any number of states: union + one groupBy over states
    * (each |keys| rows, not raw data). Keys absent from one side pass
    * through untouched.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _).groupBy(keys.map(col): _*).agg(
      sum(col("s_n")).as("s_n"),
      sum(col("s_sum")).cast("decimal(28,2)").as("s_sum"),
      min(col("s_min")).as("s_min"),
      max(col("s_max")).as("s_max"),
      hll_union_agg(col("s_hll")).as("s_hll"))

  /** Resolve a state into the user-facing rollup: n, sum, min, max,
    * avg (double division rounded at 6, replayable cross-engine) and
    * the HLL distinct estimate.
    */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("s_n").as("n"),
      col("s_sum").cast("double").as("sum_v"),
      col("s_min").as("min_v"),
      col("s_max").as("max_v"),
      round(col("s_sum").cast("double") / col("s_n"), 6).as("avg_v"),
      hll_sketch_estimate(col("s_hll")).as("n_distinct_est")): _*)
}
