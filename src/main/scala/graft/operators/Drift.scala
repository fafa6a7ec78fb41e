package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two slices of a table — the
  * monitoring step of a training-data pipeline (did this month's crawl
  * shift against last month's? does slice A of the corpus look like
  * slice B?).
  *
  * [[ksStatistic]] computes the EXACT two-sample Kolmogorov–Smirnov
  * distance, not a binned approximation: D = max over values of
  * |F_A(v) - F_B(v)|. The empirical CDFs come from a distributed
  * prefix sum ([[Ranking.prefixSums]]) over the distinct-value counts,
  * so no single-partition window and no per-group value buffering
  * appears anywhere: the shuffle is keyed by value for the count
  * aggregation, then range-partitioned for the CDF. The decision
  * arithmetic stays integral — D's numerator is
  * |cumA·nB - cumB·nA| over BIGINTs — so the max is exact and
  * engine-portable; only the final ratio becomes a rounded double.
  */
object Drift {

  /** One row: group sizes, the integral KS numerator, and the KS
    * statistic `d_num / (n_a * n_b)` rounded at 6 decimals.
    *
    * `numPartitions` sizes the CDF's range partitioning (bounded by
    * the distinct-value count, which for a CDF is the data's value
    * cardinality — pick cardinality/partition-budget at scale).
    */
  def ksStatistic(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String,
      numPartitions: Int = 32): DataFrame = {
    val counts = df
      .where(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).as("v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("a"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("b"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val cum = Ranking.prefixSums(counts, Seq(col("v")),
      Seq("ca" -> "cum_a", "cb" -> "cum_b"), numPartitions)
    val n = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(n))
      .select(col("na"), col("nb"),
        abs(col("cum_a") * col("nb") - col("cum_b") * col("na"))
          .as("dnum"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("dnum")).as("d_num"))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("d_num"),
        round(col("d_num").cast("double") / (col("na") * col("nb")), 6)
          .as("ks"))
  }
}
