package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.config.ScanConfig
import graft.sinks.{ReportSink, XlsxSink}

/** End-to-end verification of the reference's primary lifecycle
  * (whiteRRabbit.R:450-534): discover files → per-file scan loop →
  * overview assembly → report sink. This drives the exact code path a
  * CLI user hits (`DelimitedSource.listFiles` → `Scan.scanFolder` →
  * `ReportSink.writeTsv`/`writeWorkbook`), then reads the WRITTEN
  * sheets back from disk and melts them into a long-form digest
  * `(sheet, row_id, metric, sval, nval)` that a DuckDB oracle
  * reproduces from the original parquet tables.
  *
  * The fixture is two delimited files derived from the `customer` and
  * `nation` parquet tables (stringified — the scan must re-discover the
  * numeric columns via type inference). All three sink artifacts are
  * written and read back: TSV sheets re-enter as all-string CSV, the
  * parquet workbook re-enters typed, and the real `.xlsx` file is
  * unzipped and its SpreadsheetML cells parsed back ([[XlsxSink
  * .readSheet]]); the digest normalizes all three to the same rows, so
  * every sheet is verified three times (prefixes `wb_` for the
  * workbook copy, `xl_` for the xlsx copy).
  */
object ScanReportE2E {

  /** Fixture tables: name → (columns, isString) in parquet order. */
  private val fixtureTables: Seq[(String, Seq[(String, Boolean)])] = Seq(
    "customer" -> Seq("c_custkey" -> false, "c_name" -> true,
      "c_nationkey" -> false, "c_acctbal" -> false,
      "c_mktsegment" -> true),
    "nation" -> Seq("n_nationkey" -> false, "n_name" -> true,
      "n_regionkey" -> false))

  private val prefix = "ScanReport"

  /** Write `df` as ONE delimited file at `path` (not a part-file
    * directory): Spark writes to a staging dir, the single part file is
    * moved into place. Driver-side file moves are test-fixture
    * scaffolding only — production inputs already exist as files.
    */
  private def writeSingleTsv(df: DataFrame, path: String): Unit = {
    val staging = path + ".staging"
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true").csv(staging)
    val stagingDir = new java.io.File(staging)
    val part = stagingDir.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no part file written under $staging"))
    val dst = new java.io.File(path)
    dst.getParentFile.mkdirs()
    if (dst.exists()) dst.delete()
    java.nio.file.Files.move(part.toPath, dst.toPath)
    stagingDir.listFiles().foreach(_.delete())
    stagingDir.delete()
  }

  // ---------------------------------------------------------------
  // Sheet melts: each read-back sheet becomes long-form rows
  // (sheet, row_id, metric, sval, nval). Numeric stats round to 4
  // decimals, percentages to 6 (same on the oracle side).
  // ---------------------------------------------------------------

  private val countMetrics = Seq(
    "TotalCount" -> "total_count", "NonMissingCount" -> "non_missing",
    "MissingCount" -> "missing_count", "EmptyCount" -> "empty_count",
    "DistinctCount" -> "distinct_count")
  private val statMetrics = Seq(
    "MinVal" -> "min_val", "MaxVal" -> "max_val", "MeanVal" -> "mean_val",
    "MedianVal" -> "median_val", "SDVal" -> "sd_val", "Q1Val" -> "q1_val",
    "Q3Val" -> "q3_val", "IQRVal" -> "iqr_val")

  private def shape(df: DataFrame, sheet: String): DataFrame =
    df.select(lit(sheet).as("sheet"), col("row_id"), col("metric"),
      col("sval"), col("nval"))

  private def meltSummary(df: DataFrame, sheet: String): DataFrame = {
    val entries =
      countMetrics.map { case (c, m) => s"'$m', CAST(`$c` AS DOUBLE)" } ++
        statMetrics.map { case (c, m) =>
          s"'$m', round(CAST(`$c` AS DOUBLE), 4)"
        }
    val nums = df.selectExpr("Column AS row_id",
        s"stack(${entries.length}, ${entries.mkString(", ")}) " +
          "AS (metric, nval)")
      .withColumn("sval", lit(null).cast("string"))
    val types = df.selectExpr("Column AS row_id", "'data_type' AS metric",
      "DataType AS sval", "CAST(NULL AS DOUBLE) AS nval")
    shape(nums, sheet).unionByName(shape(types, sheet))
  }

  private def meltFreq(df: DataFrame, sheet: String): DataFrame =
    shape(df.selectExpr("concat(Column, '|', Value) AS row_id",
        "stack(2, 'count', CAST(Count AS DOUBLE), " +
          "'pct', round(CAST(Percentage AS DOUBLE), 6)) AS (metric, nval)")
      .withColumn("sval", lit(null).cast("string")), sheet)

  private def meltOverview(df: DataFrame, sheet: String): DataFrame = {
    val nums = df.selectExpr("FileName AS row_id",
        "stack(4, 'n_rows', CAST(N_rows AS DOUBLE), " +
          "'n_rows_checked', CAST(N_rows_checked AS DOUBLE), " +
          "'n_fields', CAST(N_Fields AS DOUBLE), " +
          "'n_fields_empty', CAST(N_Fields_Empty AS DOUBLE)) " +
          "AS (metric, nval)")
      .withColumn("sval", lit(null).cast("string"))
    val labels = df.selectExpr("FileName AS row_id",
      "'table_label' AS metric", "`Table` AS sval",
      "CAST(NULL AS DOUBLE) AS nval")
    shape(nums, sheet).unionByName(shape(labels, sheet))
  }

  /** Run the full CLI lifecycle over a fixture folder and digest the
    * written report sheets. See object doc.
    */
  def query(s: SparkSession, dir: String,
      loadTable: String => DataFrame): DataFrame = {
    val scratch = graft.config.Scratch.runDir + "/scan_e2e_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    val inDir = s"$scratch/in"
    val outDir = s"$scratch/out"
    fixtureTables.foreach { case (name, cols) =>
      val t = loadTable(name)
      writeSingleTsv(
        t.select(t.columns.map(c => col(c).cast("string").as(c)).toSeq: _*),
        s"$inDir/$name.tsv")
    }

    val config = ScanConfig(workingFolder = inDir, delimiter = "tab",
      outputDir = outDir, outputFormat = "tsv", maxRows = -1L,
      maxDistinctValues = 1000, prefix = prefix, shiftDates = false,
      scanFieldValues = true, minCellCount = 5L, randomSample = true,
      seed = 42L)
    val results = Scan.scanFolder(s, config)
    val overview = Scan.overview(s, results)
    // the three sinks write DISJOINT paths from already-materialized
    // local sheets (Scan.scanTable collects them once, r18): submit
    // them from driver threads so the small sheet-write jobs share
    // the cluster (optimization r18, guide §2.6)
    locally {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      import scala.util.Try
      implicit val ec: ExecutionContext = ExecutionContext.global
      val outcomes = Await.result(Future.sequence(Seq(
        Future(Try(ReportSink.writeTsv(outDir, prefix, overview, results))),
        Future(Try(ReportSink.writeWorkbook(outDir, prefix, overview,
          results))),
        Future(Try(ReportSink.writeXlsx(outDir, prefix, overview,
          results))))), Duration.Inf)
      outcomes.foreach(_.get)
    }

    def tsvSheet(name: String): DataFrame =
      s.read.option("sep", "\t").option("header", "true")
        .csv(s"$outDir/${prefix}_$name")
    def wbSheet(name: String): DataFrame =
      s.read.parquet(s"$outDir/${prefix}_workbook/$name")
    // the real xlsx: unzip, DOM-parse the sheet XML, re-enter as an
    // all-string local DataFrame (the melts cast, like the TSV path)
    def xlSheet(name: String): DataFrame = {
      val (header, rows) =
        XlsxSink.readSheet(s"$outDir/$prefix.xlsx", name)
      val schema = StructType(
        header.map(h => StructField(h, StringType, nullable = true)))
      s.createDataFrame(
        java.util.Arrays.asList(rows.map(Row.fromSeq): _*), schema)
    }

    val perFile = fixtureTables.zipWithIndex.flatMap { case (_, i) =>
      val f = i + 1
      Seq(
        meltSummary(tsvSheet(s"File${f}_Summary"), s"File${f}_Summary"),
        meltSummary(wbSheet(s"File${f}_Summary"), s"wb_File${f}_Summary"),
        meltSummary(xlSheet(s"File$f"), s"xl_File${f}_Summary"),
        meltFreq(tsvSheet(s"File${f}_Freq"), s"File${f}_Freq"),
        meltFreq(wbSheet(s"File${f}_Freq"), s"wb_File${f}_Freq"),
        meltFreq(xlSheet(s"File${f}freq"), s"xl_File${f}_Freq"))
    }
    val all = (Seq(
      meltOverview(tsvSheet("Overview"), "Overview"),
      meltOverview(wbSheet("Overview"), "wb_Overview"),
      meltOverview(xlSheet("Overview"), "xl_Overview")) ++ perFile)
      .reduce(_ unionByName _)
    all.orderBy("sheet", "row_id", "metric")
  }

  // ---------------------------------------------------------------
  // DuckDB oracle: the same long-form rows computed straight from the
  // parquet tables. One aggregate CTE per (table, column) feeds both
  // sheet copies (plain and wb_).
  // ---------------------------------------------------------------

  private def q(s: String) = s.replace("'", "''")

  def oracle: String = {
    val summaryCtes = fixtureTables.flatMap { case (t, cols) =>
      cols.map { case (c, isString) =>
        val agg =
          if (isString)
            s"SELECT count(*) AS total, count(nullif($c,'')) AS nm, " +
              s"count(*) - count($c) AS miss, " +
              s"count(CASE WHEN $c = '' THEN 1 END) AS empt, " +
              s"count(DISTINCT nullif($c,'')) AS dist FROM $t"
          else {
            val d = s"CAST($c AS DOUBLE)"
            s"SELECT count(*) AS total, count($c) AS nm, " +
              s"count(*) - count($c) AS miss, 0 AS empt, " +
              s"count(DISTINCT $c) AS dist, " +
              s"round(CAST(min($c) AS DOUBLE),4) AS mn, " +
              s"round(CAST(max($c) AS DOUBLE),4) AS mx, " +
              s"round(avg($d),4) AS av, " +
              s"round(quantile_cont($d,0.5),4) AS med, " +
              s"round(stddev_samp($d),4) AS sd, " +
              s"round(quantile_cont($d,0.25),4) AS q1, " +
              s"round(quantile_cont($d,0.75),4) AS q3, " +
              s"round(quantile_cont($d,0.75) - quantile_cont($d,0.25),4) " +
              s"AS iqr FROM $t"
          }
        s"s_${t}_$c AS ($agg)"
      }
    }
    val freqCtes = fixtureTables.flatMap { case (t, cols) =>
      cols.map { case (c, isString) =>
        val v = if (isString) c else s"CAST($c AS VARCHAR)"
        val ne =
          if (isString) s"$c IS NOT NULL AND $c <> ''" else s"$c IS NOT NULL"
        s"f_${t}_$c AS (SELECT $v AS value, count(*) AS cnt FROM $t " +
          s"WHERE $ne GROUP BY 1 HAVING count(*) >= 5)"
      }
    }

    def row(sheet: String, rowId: String, metric: String, sval: String,
        nval: String, from: String = ""): String =
      s"SELECT '${q(sheet)}' AS sheet, $rowId AS row_id, " +
        s"'$metric' AS metric, $sval AS sval, $nval AS nval$from"

    val sheetPrefixes = Seq("", "wb_", "xl_")
    val selects = sheetPrefixes.flatMap { p =>
      val overview = fixtureTables.zipWithIndex.flatMap { case ((t, cols), i) =>
        val sheet = s"${p}Overview"
        val rid = s"'$t.tsv'"
        Seq(
          row(sheet, rid, "n_rows", "CAST(NULL AS VARCHAR)",
            "CAST(count(*) + 1 AS DOUBLE)", s" FROM $t"),
          row(sheet, rid, "n_rows_checked", "CAST(NULL AS VARCHAR)",
            "CAST(count(*) AS DOUBLE)", s" FROM $t"),
          row(sheet, rid, "n_fields", "CAST(NULL AS VARCHAR)",
            s"CAST(${cols.length} AS DOUBLE)"),
          row(sheet, rid, "n_fields_empty", "CAST(NULL AS VARCHAR)",
            "CAST(0 AS DOUBLE)"),
          row(sheet, rid, "table_label", s"'File${i + 1}'",
            "CAST(NULL AS DOUBLE)"))
      }
      val summaries = fixtureTables.zipWithIndex.flatMap {
        case ((t, cols), i) =>
          val sheet = s"${p}File${i + 1}_Summary"
          cols.flatMap { case (c, isString) =>
            val cte = s"s_${t}_$c"
            val rid = s"'$c'"
            val counts = Seq("total" -> "total_count", "nm" -> "non_missing",
              "miss" -> "missing_count", "empt" -> "empty_count",
              "dist" -> "distinct_count").map { case (f, m) =>
              row(sheet, rid, m, "CAST(NULL AS VARCHAR)",
                s"CAST($f AS DOUBLE)", s" FROM $cte")
            }
            val stats =
              if (isString)
                statMetrics.map { case (_, m) =>
                  row(sheet, rid, m, "CAST(NULL AS VARCHAR)",
                    "CAST(NULL AS DOUBLE)")
                }
              else
                Seq("mn" -> "min_val", "mx" -> "max_val", "av" -> "mean_val",
                  "med" -> "median_val", "sd" -> "sd_val", "q1" -> "q1_val",
                  "q3" -> "q3_val", "iqr" -> "iqr_val").map { case (f, m) =>
                  row(sheet, rid, m, "CAST(NULL AS VARCHAR)", f,
                    s" FROM $cte")
                }
            val dtype = row(sheet, rid, "data_type",
              if (isString) "'character'" else "'numeric'",
              "CAST(NULL AS DOUBLE)")
            counts ++ stats :+ dtype
          }
      }
      val freqs = fixtureTables.zipWithIndex.flatMap { case ((t, cols), i) =>
        val sheet = s"${p}File${i + 1}_Freq"
        cols.flatMap { case (c, _) =>
          val cte = s"f_${t}_$c"
          val rid = s"'$c' || '|' || value"
          Seq(
            row(sheet, rid, "count", "CAST(NULL AS VARCHAR)",
              "CAST(cnt AS DOUBLE)", s" FROM $cte"),
            row(sheet, rid, "pct", "CAST(NULL AS VARCHAR)",
              s"round(cnt / (SELECT sum(cnt) FROM $cte), 6)",
              s" FROM $cte"))
        }
      }
      overview ++ summaries ++ freqs
    }

    s"WITH ${(summaryCtes ++ freqCtes).mkString(", ")} " +
      selects.mkString(" UNION ALL ") +
      " ORDER BY sheet, row_id, metric"
  }
}
