package graft

import org.apache.spark.sql.SparkSession

import graft.config.ScanConfig
import graft.sinks.ReportSink

/** CLI entry point mirroring the reference's option surface
  * (whiteRRabbit.R:29-83) — a user of the reference can run the same
  * scan with the same flags and get the same report sheets:
  *
  *   tools/run.sh graft.ScanMain \
  *     --working_folder /data/in --delimiter tab --output_dir /data/out \
  *     --output_format tsv --maxRows 100000 --maxDistinctValues 1000 \
  *     --prefix ScanReport --cpus 8 --exclude_cols id,ssn \
  *     --shift_dates false --scan_field_values true --min_cell_count 5 \
  *     --random_sample true [--seed 42]
  *
  * --seed is an engine addition (the reference's sampling/shift are
  * unseeded, whiteRRabbit.R:252,:288).
  */
object ScanMain {

  /** Options that are store_true flags in the reference
    * (whiteRRabbit.R:67-82): a bare `--shift_dates` means true, and an
    * explicit `--shift_dates false` is also accepted.
    */
  private val boolFlags = Set("shift_dates", "scan_field_values",
    "random_sample")

  def parse(args: Array[String]): ScanConfig = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (!a.startsWith("--"))
        throw new IllegalArgumentException(
          s"unexpected token '$a' (options are --key [value])")
      val k = a.drop(2)
      val hasValue = i + 1 < args.length && !args(i + 1).startsWith("--")
      if (hasValue) { m += k -> args(i + 1); i += 2 }
      else if (boolFlags(k)) { m += k -> "true"; i += 1 } // bare flag
      else throw new IllegalArgumentException(s"--$k requires a value")
    }
    def b(s: String): Boolean = s.equalsIgnoreCase("true")
    var c = ScanConfig()
    m.foreach {
      case ("working_folder", v)    => c = c.copy(workingFolder = v)
      case ("delimiter", v)         => c = c.copy(delimiter = v)
      case ("output_dir", v)        => c = c.copy(outputDir = v)
      case ("output_format", v)     => c = c.copy(outputFormat = v)
      case ("maxRows", v)           => c = c.copy(maxRows = v.toLong)
      case ("maxDistinctValues", v) => c = c.copy(maxDistinctValues = v.toInt)
      case ("prefix", v)            => c = c.copy(prefix = v)
      case ("cpus", v)              => c = c.copy(cpus = v.toInt)
      case ("exclude_cols", v) =>
        c = c.copy(excludeCols =
          v.split(',').map(_.trim).filter(_.nonEmpty).toIndexedSeq)
      case ("shift_dates", v)       => c = c.copy(shiftDates = b(v))
      case ("scan_field_values", v) => c = c.copy(scanFieldValues = b(v))
      case ("min_cell_count", v)    => c = c.copy(minCellCount = v.toLong)
      case ("random_sample", v)     => c = c.copy(randomSample = b(v))
      case ("seed", v)              => c = c.copy(seed = v.toLong)
      case (k, _) =>
        throw new IllegalArgumentException(s"unknown option --$k")
    }
    require(m.contains("working_folder"), "--working_folder is required")
    c
  }

  /** The scan lifecycle against a provided session (testable — the
    * CLI `main` owns session lifetime, this does not).
    */
  def run(spark: SparkSession, config: ScanConfig): Unit = {
    val results = Scan.scanFolder(spark, config)
    require(results.nonEmpty,
      s"no ${config.filePattern} files in ${config.workingFolder}")
    val overview = Scan.overview(spark, results)
    ReportSink.write(config.outputDir, config.prefix, config.outputFormat,
      overview, results)
    println(s"[graft] scanned ${results.length} file(s) -> " +
      s"${config.outputDir}/${config.prefix}_*")
  }

  def main(args: Array[String]): Unit = {
    val config = parse(args)
    // fork-free local FS — see graft.hadoop.FastLocalFileSystem
    val spark = graft.hadoop.FastLocalFileSystem.config(
      SparkSession.builder()
      .master(s"local[${config.cpus}]")
      .appName("graft-scan")
      .config("spark.sql.shuffle.partitions", config.cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, config)
    spark.stop()
  }
}
