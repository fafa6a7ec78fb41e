package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Frequency, Profile}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) registers a query here; queries with SQL-expressible
  * semantics also register a DuckDB oracle in [[oracleSql]]. Column
  * names and ordering are kept identical between the Spark query and
  * the oracle SQL (the driver hash-compares values after sorting
  * columns by name). Floating-point stats are rounded to fixed decimals
  * on BOTH sides so cross-engine double arithmetic cannot flip the hash.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // -------------------------------------------------------------------
  // Table column metadata used to generate oracle SQL (mirrors the
  // driver-generated parquet schemas documented in TESTDATA.md).
  // -------------------------------------------------------------------
  private sealed trait K
  private case object Num extends K
  private case object Str extends K
  private case object Ts extends K

  private val tables: Map[String, Seq[(String, K)]] = Map(
    "lineitem" -> Seq(
      "l_orderkey" -> Num, "l_partkey" -> Num, "l_suppkey" -> Num,
      "l_linenumber" -> Num, "l_quantity" -> Num, "l_extendedprice" -> Num,
      "l_discount" -> Num, "l_tax" -> Num, "l_returnflag" -> Str,
      "l_linestatus" -> Str, "l_shipdate" -> Ts),
    "orders" -> Seq(
      "o_orderkey" -> Num, "o_custkey" -> Num, "o_orderstatus" -> Str,
      "o_totalprice" -> Num, "o_orderdate" -> Ts, "o_orderpriority" -> Str),
    "customer" -> Seq(
      "c_custkey" -> Num, "c_name" -> Str, "c_nationkey" -> Num,
      "c_acctbal" -> Num, "c_mktsegment" -> Str)
  )

  private val dblCols = Set("min_val", "max_val", "mean_val", "median_val",
    "sd_val", "q1_val", "q3_val", "iqr_val")

  /** Profile.summarize with doubles rounded to 4 decimals (both sides of
    * the oracle compare round identically) and deterministic row order.
    */
  private def roundedSummary(df: DataFrame): DataFrame = {
    val base = Profile.summarize(df)
    val cols = base.columns.map {
      case c if dblCols.contains(c) => round(col(c), 4).as(c)
      case c                        => col(c)
    }
    base.select(cols.toSeq: _*).orderBy("column_name")
  }

  private val nullStats: String = Seq("min_val", "max_val", "mean_val",
    "median_val", "sd_val", "q1_val", "q3_val", "iqr_val")
    .map(n => s"CAST(NULL AS DOUBLE) AS $n").mkString(", ")
  private val nullTs: String = Seq("earliest_us", "latest_us", "median_us")
    .map(n => s"CAST(NULL AS BIGINT) AS $n").mkString(", ")

  /** DuckDB oracle for [[roundedSummary]] over one table: a UNION ALL of
    * one aggregate SELECT per column, mirroring Profile.summarize
    * semantics field-for-field (see whiteRRabbit.R:313-423).
    */
  private def summaryOracle(table: String): String = {
    val parts = tables(table).map { case (c, k) =>
      k match {
        case Num =>
          val d = s"CAST($c AS DOUBLE)"
          s"SELECT '$c' AS column_name, 'numeric' AS data_type, " +
            s"count(*) AS total_count, count($c) AS non_missing, " +
            s"count(*) - count($c) AS missing_count, " +
            s"CAST(0 AS BIGINT) AS empty_count, " +
            s"count(DISTINCT $c) AS distinct_count, " +
            s"round(CAST(min($c) AS DOUBLE),4) AS min_val, " +
            s"round(CAST(max($c) AS DOUBLE),4) AS max_val, " +
            s"round(avg($d),4) AS mean_val, " +
            s"round(quantile_cont($d,0.5),4) AS median_val, " +
            s"round(stddev_samp($d),4) AS sd_val, " +
            s"round(quantile_cont($d,0.25),4) AS q1_val, " +
            s"round(quantile_cont($d,0.75),4) AS q3_val, " +
            s"round(quantile_cont($d,0.75) - quantile_cont($d,0.25),4) AS iqr_val, " +
            s"$nullTs FROM $table"
        case Str =>
          s"SELECT '$c', 'character', count(*), count(nullif($c,'')), " +
            s"count(*) - count($c), count(*) FILTER (WHERE $c = ''), " +
            s"count(DISTINCT nullif($c,'')), $nullStats, $nullTs FROM $table"
        case Ts =>
          s"SELECT '$c', 'POSIXct, POSIXt', count(*), count($c), " +
            s"count(*) - count($c), CAST(0 AS BIGINT), count(DISTINCT $c), " +
            s"$nullStats, epoch_us(min($c)), epoch_us(max($c)), " +
            s"CAST(floor(quantile_cont(epoch_us($c),0.5)) AS BIGINT) " +
            s"FROM $table"
      }
    }
    parts.mkString("", " UNION ALL ", " ORDER BY column_name")
  }

  /** Spark side of the frequency queries: rounded pct, deterministic
    * order. `cols` must avoid floating-point columns (double→string
    * rendering is not oracle-portable; integer and string columns are).
    */
  private def freqQuery(df: DataFrame, cols: Seq[String],
      minCell: Long, maxDistinct: Int): DataFrame =
    Frequency.frequencies(df, cols, minCell, maxDistinct)
      .select(col("col_name"), col("value"), col("cnt"),
        round(col("pct"), 6).as("pct"))
      .orderBy(col("col_name"), col("cnt").desc, col("value"))

  /** DuckDB oracle for [[freqQuery]] (semantics of whiteRRabbit.R:329-352
    * incl. the post-truncation percentage denominator at :344).
    */
  private def freqOracle(table: String, cols: Seq[(String, Boolean)],
      minCell: Long, maxDistinct: Int): String = {
    val parts = cols.map { case (c, isString) =>
      val v = if (isString) c else s"CAST($c AS VARCHAR)"
      val nonMissing =
        if (isString) s"$c IS NOT NULL AND $c <> ''" else s"$c IS NOT NULL"
      s"SELECT '$c' AS col_name, $v AS value, count(*) AS cnt FROM $table " +
        s"WHERE $nonMissing GROUP BY 2 HAVING count(*) >= $minCell"
    }
    s"WITH c AS (${parts.mkString(" UNION ALL ")}), " +
      "t AS (SELECT *, row_number() OVER (PARTITION BY col_name " +
      "ORDER BY cnt DESC, value ASC) AS rn FROM c), " +
      s"k AS (SELECT col_name, value, cnt FROM t WHERE rn <= $maxDistinct) " +
      "SELECT col_name, value, cnt, round(cnt / sum(cnt) OVER " +
      "(PARTITION BY col_name), 6) AS pct FROM k " +
      "ORDER BY col_name, cnt DESC, value"
  }

  // -------------------------------------------------------------------
  // Public contract
  // -------------------------------------------------------------------

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    roundedSummary(tbl(spark, "/root/testdata/sf0.001", "lineitem"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ops 9,10,12,13,14 — per-column profile suites (whiteRRabbit.R:309-423)
    "summary_lineitem" -> ((s, dir) => roundedSummary(tbl(s, dir, "lineitem"))),
    "summary_orders"   -> ((s, dir) => roundedSummary(tbl(s, dir, "orders"))),
    "summary_customer" -> ((s, dir) => roundedSummary(tbl(s, dir, "customer"))),
    // op 11 — thresholded top-K value frequencies (whiteRRabbit.R:329-352)
    "freq_lineitem" -> ((s, dir) => freqQuery(tbl(s, dir, "lineitem"),
      Seq("l_returnflag", "l_linestatus", "l_linenumber"), 5L, 1000)),
    "freq_orders" -> ((s, dir) => freqQuery(tbl(s, dir, "orders"),
      Seq("o_orderstatus", "o_orderpriority"), 5L, 1000)),
    "freq_customer" -> ((s, dir) => freqQuery(tbl(s, dir, "customer"),
      Seq("c_mktsegment"), 5L, 1000)),
    // op 11 truncation path: top-10 cap exercises the post-truncation
    // percentage denominator (whiteRRabbit.R:336-344)
    "freq_orders_custkey_top10" -> ((s, dir) => freqQuery(
      tbl(s, dir, "orders"), Seq("o_custkey"), 5L, 10))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "summary_lineitem" -> summaryOracle("lineitem"),
    "summary_orders"   -> summaryOracle("orders"),
    "summary_customer" -> summaryOracle("customer"),
    "freq_lineitem" -> freqOracle("lineitem",
      Seq("l_returnflag" -> true, "l_linestatus" -> true,
        "l_linenumber" -> false), 5L, 1000),
    "freq_orders" -> freqOracle("orders",
      Seq("o_orderstatus" -> true, "o_orderpriority" -> true), 5L, 1000),
    "freq_customer" -> freqOracle("customer",
      Seq("c_mktsegment" -> true), 5L, 1000),
    "freq_orders_custkey_top10" -> freqOracle("orders",
      Seq("o_custkey" -> false), 5L, 10)
  )
}
