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
  * |cumA·nB - cumB·nA| computed in DECIMAL(38,0), which stays exact
  * up to ~10^19 rows per slice where a BIGINT product would wrap
  * silently (non-ANSI multiply) at ~3·10^9 rows — so the max is
  * exact and engine-portable at any realistic scale; the numerator
  * and the final ratio surface as doubles.
  */
object Drift {

  /** One row: group sizes, the integral KS numerator, and the KS
    * statistic `d_num / (n_a * n_b)` rounded at 6 decimals.
    *
    * `numPartitions` sizes the CDF's range partitioning (bounded by
    * the distinct-value count, which for a CDF is the data's value
    * cardinality — pick cardinality/partition-budget at scale).
    */
  /** Population Stability Index between the two slices over
    * `numBins` equi-width bins of the A-slice's [min, max] — the
    * binned drift score production monitoring dashboards use
    * (rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).
    * Coarser than [[ksStatistic]] but directly comparable across runs
    * because the bin grid is fixed by the reference slice.
    *
    * One pass to find the reference range, one binned aggregation —
    * both all-column-scan shaped, state is O(numBins). Bin assignment
    * reuses the histogram's `least(b-1, floor((x-lo)*b/(hi-lo)))`
    * IEEE ordering so a SQL oracle replays bins bit-for-bit; B-values
    * outside the reference range clamp into the edge bins. The cell
    * table is completed against the full 0..numBins-1 grid, so a bin
    * empty in BOTH slices still contributes its smoothed
    * (0.5/nA - 0.5/nB)·ln(nB/nA) term when the slice sizes differ —
    * the textbook fixed-grid PSI, not a union-of-observed-bins
    * variant. Zero cells are smoothed by 0.5 (Laplace) before the
    * log ratio, and each bin's contribution is rounded at 9 decimals
    * and summed as DECIMAL, making the total order-independent and
    * engine-portable. Returns empty when either slice is empty (PSI
    * is undefined there) rather than a division-by-zero row.
    */
  def psi(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String, numBins: Int = 10): DataFrame = {
    require(numBins > 0, s"numBins must be positive: $numBins")
    val tagged = df
      .where(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).cast("double").as("v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("a"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("b"))
      .where(col("v").isNotNull)
    val range = tagged.where(col("a") === 1L)
      .agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val bin = when(col("__hi") === col("__lo"), lit(0))
      .otherwise(greatest(lit(0), least(lit(numBins - 1),
        floor((col("v") - col("__lo")) * numBins /
          (col("__hi") - col("__lo"))).cast("int"))))
    val observed = tagged.crossJoin(broadcast(range))
      .select(bin.as("bin"), col("a"), col("b"))
      .groupBy(col("bin"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    // complete against the fixed grid: doubly-empty interior bins
    // must still carry their smoothed term (numBins rows — tiny)
    val grid = df.sparkSession.range(numBins.toLong)
      .select(col("id").cast("int").as("bin"))
    val cells = grid.join(broadcast(observed), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val n = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val pa = when(col("ca") > 0, col("ca").cast("double"))
      .otherwise(lit(0.5)) / col("na")
    val pb = when(col("cb") > 0, col("cb").cast("double"))
      .otherwise(lit(0.5)) / col("nb")
    cells.crossJoin(broadcast(n))
      .where(col("na") > 0 && col("nb") > 0)
      .select(col("na"), col("nb"),
        round((pa - pb) * log(pa / pb), 9).cast("decimal(20,9)")
          .as("term"))
      .groupBy(col("na"), col("nb"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("psi"))
  }

  def ksStatistic(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String,
      numPartitions: Int = 32): DataFrame = {
    val counts = df
      .where(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).as("v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("a"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("b"))
      // NULL is not a CDF point (and range partitioning would order
      // it differently from a SQL ORDER BY anyway — drop it here)
      .where(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val cum = Ranking.prefixSums(counts, Seq(col("v")),
      Seq("ca" -> "cum_a", "cb" -> "cum_b"), numPartitions)
    val n = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    // cross-multiply in DECIMAL(38,0): counts are longs, so each
    // factor fits decimal(19,0) and the product stays exact where a
    // long*long would wrap past ~3e9 rows per slice
    val dec = "decimal(19,0)"
    cum.crossJoin(broadcast(n))
      .select(col("na"), col("nb"),
        abs(col("cum_a").cast(dec) * col("nb").cast(dec) -
          col("cum_b").cast(dec) * col("na").cast(dec)).as("dnum"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("dnum")).as("d_num"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("d_num").cast("double").as("d_num"),
        round(col("d_num").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 6)
          .as("ks"))
  }

  /** Pairwise KS drift matrix over every pair of groups — the corpus
    * monitoring view ("which sources drifted against which?").
    *
    * Contract: `valueCol` has a BOUNDED discrete domain (token
    * counts, bucketed scores, day numbers …). The per-group CDFs are
    * computed on the dense group × distinct-value grid, so window
    * frames are domain-sized — never data-sized — and the pair join
    * emits O(|groups|² · |domain|) rows: matrix semantics like the
    * cross-source overlap report, not a row-volume-scaled operator.
    * The KS numerator reuses [[ksStatistic]]'s overflow-proof
    * DECIMAL(38,0) cross-multiplication; for two groups the matrix
    * row equals `ksStatistic`'s (spec-pinned cross-law).
    */
  def ksMatrix(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val values = counts.select(col("v")).distinct()
    val sizes = counts.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cums = sizes.crossJoin(broadcast(values))
      .join(counts, Seq("g", "v"), "left")
      .select(col("g"), col("n"), col("v"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
    val dec = "decimal(19,0)"
    val a = cums.select(col("g").as("g_a"), col("n").as("n_a"),
      col("v"), col("cum").as("cum_a"))
    val b = cums.select(col("g").as("g_b"), col("n").as("n_b"),
      col("v"), col("cum").as("cum_b"))
    a.join(b, Seq("v")).where(col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        abs(col("cum_a").cast(dec) * col("n_b").cast(dec) -
          col("cum_b").cast(dec) * col("n_a").cast(dec)).as("dnum"))
      .groupBy(col("g_a"), col("g_b"), col("n_a"), col("n_b"))
      .agg(max(col("dnum")).as("d"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        round(col("d").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks"))
      .orderBy("g_a", "g_b")
  }
}
