package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.XlsxSink

/** CLI surface of [[ScanMain]]: option parsing and the reference's
  * bare-flag default behavior — in particular the r4 parity fix that a
  * run with only the required flags produces an `.xlsx` workbook, the
  * reference's default output format (whiteRRabbit.R:43-44).
  */
class ScanMainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bare-flag parse defaults to the reference's xlsx format") {
    val c = ScanMain.parse(Array("--working_folder", "/data/in"))
    assert(c.outputFormat == "xlsx")
    assert(c.delimiter == "tab" && c.maxRows == 100000L &&
      c.maxDistinctValues == 1000 && c.prefix == "ScanReport" &&
      c.minCellCount == 5L && c.randomSample && c.scanFieldValues &&
      !c.shiftDates)
  }

  test("a bare-flag run writes <prefix>.xlsx like the reference") {
    val dir = graft.config.Scratch.dir + "/scanmain_default"
    val in = s"$dir/in"; val out = s"$dir/out"
    Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(s"$in/people.tsv"),
      "name\tage\nada\t36\ngrace\t45\nada\t36\n"
        .getBytes("UTF-8"))
    // run() against the shared test session — main() owns (and stops)
    // its own session, which a test must not do
    ScanMain.run(spark, ScanMain.parse(Array(
      "--working_folder", in, "--output_dir", out, "--cpus", "2")))
    assert(Files.exists(Paths.get(s"$out/ScanReport.xlsx")),
      "default run must produce the reference's xlsx workbook")
    val (oHeader, oRows) =
      XlsxSink.readSheet(s"$out/ScanReport.xlsx", "Overview")
    assert(oHeader.nonEmpty && oRows.nonEmpty)
    val (sHeader, sRows) =
      XlsxSink.readSheet(s"$out/ScanReport.xlsx", "File1")
    assert(sHeader.contains("Column") && sRows.nonEmpty)
  }
}
