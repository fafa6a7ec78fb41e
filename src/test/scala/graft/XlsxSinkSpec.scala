package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.XlsxSink

/** Pins the hand-rolled SpreadsheetML writer (whiteRRabbit.R:485-514
  * xlsx parity): write → readSheet must round-trip values including
  * XML-escaped characters, NULL cells, and numeric cells; the package
  * must contain the mandatory OOXML parts; the header row must carry
  * the bold style and the sheet a frozen first row.
  */
class XlsxSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    graft.config.Scratch.dir + s"/xlsx_spec/$name"

  test("write/readSheet round-trips strings, numbers, nulls, escapes") {
    val df = Seq(
      ("a<b&c>\"d\"", Some(1.5), 10L),
      ("plain", None, -3L),
      ("ends with space ", Some(2.0), 0L))
      .toDF("s", "d", "n")
    val path = tmp("roundtrip.xlsx")
    XlsxSink.write(path, Seq("Sheet1" -> df))
    val (header, rows) = XlsxSink.readSheet(path, "Sheet1")
    assert(header == Seq("s", "d", "n"))
    assert(rows == Seq(
      Seq("a<b&c>\"d\"", "1.5", "10"),
      Seq("plain", null, "-3"),
      Seq("ends with space ", "2.0", "0")))
  }

  test("non-finite doubles render as inline strings, not <v> numbers") {
    val df = Seq(
      ("nan", Double.NaN), ("inf", Double.PositiveInfinity),
      ("ninf", Double.NegativeInfinity), ("ok", 1.25))
      .toDF("s", "d")
    val path = tmp("nonfinite.xlsx")
    XlsxSink.write(path, Seq("Sheet1" -> df))
    // the reader sees the values either way; the zip must contain no
    // numeric <v> cell holding a non-number (Excel reports the
    // workbook as corrupt otherwise)
    val (_, rows) = XlsxSink.readSheet(path, "Sheet1")
    assert(rows.map(_(1)) == Seq("NaN", "Infinity", "-Infinity", "1.25"))
    import java.util.zip.ZipFile
    val z = new ZipFile(path)
    try {
      val sheet1 = scala.io.Source.fromInputStream(
        z.getInputStream(z.getEntry("xl/worksheets/sheet1.xml"))).mkString
      assert(!sheet1.contains("<v>NaN</v>") &&
        !sheet1.contains("<v>Infinity</v>") &&
        !sheet1.contains("<v>-Infinity</v>"))
      assert(sheet1.contains("<v>1.25</v>"))
    } finally z.close()
  }

  test("workbook carries multiple sheets with the mandatory parts, " +
      "bold header and frozen pane") {
    val df1 = Seq(("x", 1)).toDF("c1", "c2")
    val df2 = Seq(("y", 2)).toDF("k", "v")
    val path = tmp("multi.xlsx")
    XlsxSink.write(path, Seq("Overview" -> df1, "File1" -> df2))
    val (_, r2) = XlsxSink.readSheet(path, "File1")
    assert(r2 == Seq(Seq("y", "2")))
    // package structure + header styling, straight from the zip
    import java.util.zip.ZipFile
    val z = new ZipFile(path)
    try {
      val names = z.entries()
      val all = scala.collection.mutable.Set[String]()
      while (names.hasMoreElements) all += names.nextElement().getName
      assert(Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/styles.xml",
        "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml")
        .forall(all.contains))
      val sheet1 = scala.io.Source.fromInputStream(
        z.getInputStream(z.getEntry("xl/worksheets/sheet1.xml"))).mkString
      assert(sheet1.contains("state=\"frozen\""))
      assert(sheet1.contains("<c r=\"A1\" s=\"1\"")) // bold style xf 1
      val styles = scala.io.Source.fromInputStream(
        z.getInputStream(z.getEntry("xl/styles.xml"))).mkString
      assert(styles.contains("<b/>"))
    } finally z.close()
  }
  test("an unbounded frame fails loudly at the documented cap instead " +
      "of collecting the table onto the driver") {
    val big = spark.range(XlsxSink.MaxSheetRows + 1L).toDF("id")
    val ex = intercept[IllegalArgumentException] {
      XlsxSink.write(tmp("oversize.xlsx"), Seq("big" -> big))
    }
    assert(ex.getMessage.contains("report-sized"))
    // at the cap exactly, the sink still renders
    val ok = spark.range(3L).toDF("id")
    XlsxSink.write(tmp("undersize.xlsx"), Seq("ok" -> ok))
    assert(XlsxSink.readSheet(tmp("undersize.xlsx"), "ok")._2.length == 3)
  }
}
