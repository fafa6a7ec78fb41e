package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing and disclosure-limited release — the checks a
  * training-data pipeline runs before publishing aggregates or
  * releasing a dataset (complements the PII scrubbing in
  * [[graft.functions.TextFunctions]] and the date shifting in
  * [[DateShift]]).
  */
object Privacy {

  /** k-anonymity audit over a set of quasi-identifier columns: every
    * row whose QI combination is shared by fewer than k rows is
    * re-identifiable by joining on those columns. One groupBy over
    * the QI key + one rollup row — group count is bounded by the QI
    * domain, not the table.
    *
    * Returns one row: group count, violating-group count, rows at
    * risk, smallest group, and the suppression rate (share of rows
    * that would need suppressing to reach k).
    */
  def kAnonymity(df: DataFrame, quasiIdCols: Seq[String], k: Int)
      : DataFrame =
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L))
          .as("n_rows_at_risk"),
        min(col("sz")).as("min_group"),
        round(sum(when(col("sz") < k, col("sz")).otherwise(0L))
          .cast("double") / sum(col("sz")), 9).as("suppression_rate"))

  /** Laplace(0, b) noise derived DETERMINISTICALLY from the group key:
    * the repo's replayable LCG char fold (the [[graft.functions
    * .PolySimHash64]] recurrence — (h+c)·A wrapping mod 2⁶⁴) seeds
    * three MINSTD rounds mapping the key to u ∈ (−0.5, 0.5), then the
    * inverse CDF −b·sgn(u)·ln(1−2|u|) yields the deviate. Determinism
    * makes the whole release replayable by a SQL oracle (and stable
    * across retries — a real deployment would swap in a cryptographic
    * RNG, trading replayability for actual privacy; the WHOLE point of
    * this hook is that only this one expression changes).
    */
  def seededLaplace(key: Column, b: Double): Column = {
    val m = 2147483647L
    // native LCG char fold (wraps mod 2^64 — ANSI-safe because the
    // wrap happens inside the codegen'd expression, not Column math);
    // the oracle mirrors it in HUGEINT arithmetic
    val h0 = graft.functions.SetExpressions.polyHash64(key)
    val h = (1 to 3).foldLeft(pmod(h0, lit(m))) {
      (acc, _) => pmod(acc * lit(48271L), lit(m))
    }
    // keep u strictly inside (−0.5, 0.5): ln(0) is −inf
    val u = (h.cast("double") + 0.5) / m.toDouble - lit(0.5)
    round(-lit(b) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u)), 3)
  }

  /** Disclosure-limited count release: per-group counts with seeded
    * Laplace(1/eps) noise (ε-DP for a unit-count sensitivity under a
    * real RNG; see [[seededLaplace]] for the determinism trade).
    */
  def dpCounts(df: DataFrame, groupCol: String, eps: Double): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("true_n"))
      .select(col(groupCol),
        round(col("true_n") + seededLaplace(col(groupCol), 1.0 / eps), 3)
          .as("noisy_n"))
      .orderBy(groupCol)
}
