package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ idea —
  * Schelter et al. 2018, "Automating Large-Scale Data Quality
  * Verification" — re-expressed Spark-first): a battery of named
  * checks compiles to ONE aggregation over the table, so a hundred
  * constraints on a 100 TB table still cost exactly one scan. Each
  * check is (metric aggregate, comparison, threshold); the single
  * result row is melted back into one report row per check.
  *
  * Every metric is a plain codegen'd aggregate expression — no UDFs,
  * no per-check jobs, no driver-side evaluation. Exact-distinct
  * metrics (uniqueness) plan through Spark's Expand, which multiplies
  * shuffled rows, not scan cost; swap in approxUniqueness for
  * HLL-sketched distinct counts when the column is high-cardinality
  * and 2% error is acceptable.
  *
  * Metrics are rounded at 9 decimals, so a SQL oracle replays the
  * report bit-for-bit; `passed` is an INT 0/1 flag (the repo's
  * oracle-pinned flag convention).
  */
object QualityChecks {

  /** One declarative constraint: `metric op threshold`, where `metric`
    * is any aggregate expression producing a double. `op` is ">=" or
    * "<=".
    */
  final case class Check(name: String, column: String, metric: Column,
      op: String, threshold: Double) {
    require(op == ">=" || op == "<=", s"op must be >= or <=, got $op")
  }

  /** Fraction of rows with a non-null value. */
  def completeness(c: String, t: Double): Check =
    Check(s"completeness_$c", c,
      round(count(col(c)).cast("double") / count(lit(1)), 9), ">=", t)

  /** Exact distinct values over non-null count (1.0 = key-like). */
  def uniqueness(c: String, t: Double): Check =
    Check(s"uniqueness_$c", c,
      round(count_distinct(col(c)).cast("double") /
        count(col(c)), 9), ">=", t)

  /** HLL-sketched uniqueness for high-cardinality columns: the
    * distinct count is approximate (default rsd 5%), the state is
    * constant-size — no Expand, no distinct shuffle.
    */
  def approxUniqueness(c: String, t: Double): Check =
    Check(s"approx_uniqueness_$c", c,
      round(approx_count_distinct(col(c)).cast("double") /
        count(col(c)), 9), ">=", t)

  /** Column minimum must stay at or above `lo`. */
  def minValue(c: String, lo: Double): Check =
    Check(s"min_$c", c, round(min(col(c)).cast("double"), 9), ">=", lo)

  /** Column maximum must stay at or below `hi`. */
  def maxValue(c: String, hi: Double): Check =
    Check(s"max_$c", c, round(max(col(c)).cast("double"), 9), "<=", hi)

  /** Fraction of NON-NULL values matching an RE2-compatible pattern
    * (nulls are completeness's job, not the pattern's).
    */
  def matchFraction(c: String, pattern: String, t: Double): Check =
    Check(s"match_$c", c,
      round(sum(when(col(c).rlike(pattern), 1L).otherwise(0L))
        .cast("double") / count(col(c)), 9), ">=", t)

  /** Fraction of NON-NULL values inside an allowed set. */
  def inSet(c: String, values: Seq[String], t: Double): Check =
    Check(s"in_set_$c", c,
      round(sum(when(col(c).isin(values: _*), 1L).otherwise(0L))
        .cast("double") / count(col(c)), 9), ">=", t)

  /** Evaluate the battery in one aggregation pass and melt the single
    * result row into (check_name, column, metric, threshold, passed)
    * rows, ordered by check name.
    */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check battery")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val aggs = checks.map(c => c.metric.as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.map { c =>
      val pass = if (c.op == ">=") col(c.name) >= c.threshold
                 else col(c.name) <= c.threshold
      struct(lit(c.name).as("check_name"), lit(c.column).as("col_name"),
        col(c.name).as("metric"), lit(c.threshold).as("threshold"),
        when(pass, 1).otherwise(0).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.col_name"), col("r.metric"),
        col("r.threshold"), col("r.passed"))
      .orderBy("check_name")
  }

  /** Row-level quarantine routing — the dead-letter pattern: every
    * row is tagged with the names of the ROW-LEVEL rules it violates
    * (in rule declaration order), and the caller splits on
    * `n_reasons`: zero → the clean path, nonzero → the quarantine
    * table for triage/replay. Unlike [[evaluate]] (dataset-level
    * metrics against thresholds), this is per-row conformance — the
    * step between ingest and the clean table in every production
    * pipeline. One codegen'd projection, no shuffle, no UDF.
    */
  def quarantine(df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    // a rule evaluating to NULL (e.g. a NULL in the checked column)
    // must count as a VIOLATION: `!pred` alone would yield NULL, skip
    // the tag, and route the row to the clean path — the unsafe
    // direction for a dead-letter split, and it diverges from SQL
    // CASE semantics (WHEN NULL falls to the ELSE branch, tagging)
    val tags = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("reasons", concat_ws(",", tags: _*))
      .withColumn("n_reasons",
        size(filter(array(tags: _*), t => t.isNotNull)))
  }
}
