package graft.sinks

import java.io.{BufferedOutputStream, ByteArrayInputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Hand-rolled `.xlsx` workbook writer — the reference's xlsx sink
  * (whiteRRabbit.R:485-514: openxlsx workbook, bold header row, auto
  * column widths, frozen first row) rebuilt on `java.util.zip` + SML
  * (SpreadsheetML) XML only, since no spreadsheet library exists in
  * the offline build (build.sbt). An xlsx file IS a zip of XML parts;
  * the parts emitted here are the minimal set Excel/LibreOffice
  * require: content types, package rels, workbook + rels, one styles
  * part (normal + bold), and one worksheet part per sheet.
  *
  * Cells are written as inline strings (no sharedStrings part — report
  * sheets are small and self-contained beats an extra cross-referenced
  * part) and raw `<v>` numbers for numeric columns. NULLs become
  * omitted cells.
  *
  * Scale note: a spreadsheet is a driver-side artifact by nature — the
  * reference collects every sheet into R memory too. Sheets here are
  * report-bounded (per-column summary rows, top-K frequency rows), so
  * the `collect()` is a few hundred rows regardless of input scale; at
  * 100 TB the data behind it was still profiled distributed. The
  * parquet "workbook" sink remains the columnar companion for
  * downstream tools.
  */
object XlsxSink {

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // literal control chars are invalid in XML 1.0; strip like
      // openxlsx does rather than emit a broken part
      case c if c < ' ' && c != '\t' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  /** A1-style column name for a 0-based index (0→A, 25→Z, 26→AA). */
  private def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def isNumType(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Render one sheet's XML: frozen first row, auto column widths
    * (max rendered length + 2, capped at 60 like openxlsx's default
    * auto behavior), bold style (styles.xml xf index 1) on row 1.
    */
  private def sheetXml(header: Seq[String], rows: Seq[Seq[String]],
      numeric: Seq[Boolean]): String = {
    val nCols = header.length
    val widths = (0 until nCols).map { c =>
      val longest = (header(c).length +:
        rows.map(r => Option(r(c)).map(_.length).getOrElse(0))).max
      math.min(longest + 2, 60)
    }
    val sb = new StringBuilder(1024 + rows.length * nCols * 24)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
    sb.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\">")
    sb.append("<sheetViews><sheetView workbookViewId=\"0\">" +
      "<pane ySplit=\"1\" topLeftCell=\"A2\" activePane=\"bottomLeft\"" +
      " state=\"frozen\"/></sheetView></sheetViews>")
    sb.append("<cols>")
    widths.zipWithIndex.foreach { case (w, i) =>
      sb.append(s"<col min=\"${i + 1}\" max=\"${i + 1}\" width=\"$w\"" +
        " customWidth=\"1\"/>")
    }
    sb.append("</cols><sheetData>")
    sb.append("<row r=\"1\">")
    header.zipWithIndex.foreach { case (h, c) =>
      sb.append(s"<c r=\"${colRef(c)}1\" s=\"1\" t=\"inlineStr\">" +
        s"<is><t xml:space=\"preserve\">${esc(h)}</t></is></c>")
    }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (r, ri) =>
      val rowNum = ri + 2
      sb.append(s"<row r=\"$rowNum\">")
      r.zipWithIndex.foreach { case (v, c) =>
        if (v != null) {
          // non-finite doubles are not valid SpreadsheetML numbers —
          // <v>NaN</v> corrupts the workbook; write them as inline
          // strings instead (ADVICE r4)
          if (numeric(c) && v != "NaN" && v != "Infinity" &&
              v != "-Infinity")
            sb.append(s"<c r=\"${colRef(c)}$rowNum\"><v>${esc(v)}</v></c>")
          else
            sb.append(s"<c r=\"${colRef(c)}$rowNum\" t=\"inlineStr\">" +
              s"<is><t xml:space=\"preserve\">${esc(v)}</t></is></c>")
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  private val stylesXml: String =
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      "<styleSheet xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\">" +
      "<fonts count=\"2\"><font><sz val=\"11\"/><name val=\"Calibri\"/>" +
      "</font><font><b/><sz val=\"11\"/><name val=\"Calibri\"/></font>" +
      "</fonts>" +
      "<fills count=\"2\"><fill><patternFill patternType=\"none\"/></fill>" +
      "<fill><patternFill patternType=\"gray125\"/></fill></fills>" +
      "<borders count=\"1\"><border/></borders>" +
      "<cellStyleXfs count=\"1\"><xf/></cellStyleXfs>" +
      "<cellXfs count=\"2\"><xf/><xf fontId=\"1\" applyFont=\"1\"/>" +
      "</cellXfs></styleSheet>"

  /** Collect `df` driver-side and render (header, rows, numericity).
    * Every value becomes its unambiguous string form; doubles use
    * Scala's shortest round-trip toString so a reader recovers the
    * exact bits.
    */
  /** Hard cap on rows collected per sheet. The workbook sheets this
    * sink exists for are REPORT-sized by construction (summary sheets
    * are column-count rows; frequency sheets are bounded by
    * `maxDistinctValues`), so the cap exists to fail LOUDLY — not
    * OOM the driver — if a caller ever routes an unbounded frame at
    * it. xlsx itself caps a sheet at 1,048,576 rows; we stop far
    * below, where a driver collect is still obviously sane.
    */
  val MaxSheetRows: Int = 200000

  private def render(df: DataFrame): (Seq[String], Seq[Seq[String]],
      Seq[Boolean]) = {
    val schema = df.schema
    val numeric = schema.fields.map(f => isNumType(f.dataType)).toSeq
    // limit(cap+1) bounds the collect ITSELF — a runaway frame moves
    // cap+1 rows, not the whole table, before the require rejects it
    val collected = df.limit(MaxSheetRows + 1).collect().toSeq
    require(collected.length <= MaxSheetRows,
      s"xlsx sheet exceeds $MaxSheetRows rows — this sink renders " +
        "driver-side and is for report-sized frames only; aggregate " +
        "or cap the frame (the reference's sheets are bounded by " +
        "maxDistinctValues) before writing it to a workbook")
    val rows = collected.map { r =>
      schema.fields.indices.map { i =>
        if (r.isNullAt(i)) null else r.get(i).toString
      }
    }
    (schema.fieldNames.toSeq, rows, numeric)
  }

  /** Write one workbook at `path` with the given (name, df) sheets in
    * order. Parent directories are created; an existing file is
    * overwritten (reference: saveWorkbook overwrite = TRUE). The path
    * resolves through the Hadoop FileSystem API (taken from the first
    * sheet's session), so the workbook lands wherever the other report
    * sinks do — local, HDFS, or an object store — not only on the
    * driver's local disk.
    */
  def write(path: String, sheets: Seq[(String, DataFrame)]): Unit = {
    require(sheets.nonEmpty, "xlsx workbook needs at least one sheet")
    val conf = sheets.head._2.sparkSession
      .sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val zip = new ZipOutputStream(
      new BufferedOutputStream(fs.create(p, true)), UTF_8)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(UTF_8))
      zip.closeEntry()
    }
    try {
      val n = sheets.length
      part("[Content_Types].xml",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/" +
          "content-types\">" +
          "<Default Extension=\"rels\" ContentType=\"application/" +
          "vnd.openxmlformats-package.relationships+xml\"/>" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
          "<Override PartName=\"/xl/workbook.xml\" ContentType=\"" +
          "application/vnd.openxmlformats-officedocument.spreadsheetml." +
          "sheet.main+xml\"/>" +
          "<Override PartName=\"/xl/styles.xml\" ContentType=\"" +
          "application/vnd.openxmlformats-officedocument.spreadsheetml." +
          "styles+xml\"/>" +
          (1 to n).map(i =>
            s"<Override PartName=\"/xl/worksheets/sheet$i.xml\" " +
              "ContentType=\"application/vnd.openxmlformats-" +
              "officedocument.spreadsheetml.worksheet+xml\"/>").mkString +
          "</Types>")
      part("_rels/.rels",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<Relationships xmlns=\"http://schemas.openxmlformats.org/" +
          "package/2006/relationships\">" +
          "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats" +
          ".org/officeDocument/2006/relationships/officeDocument\" " +
          "Target=\"xl/workbook.xml\"/></Relationships>")
      part("xl/workbook.xml",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<workbook xmlns=\"http://schemas.openxmlformats.org/" +
          "spreadsheetml/2006/main\" xmlns:r=\"http://schemas." +
          "openxmlformats.org/officeDocument/2006/relationships\">" +
          "<sheets>" +
          sheets.zipWithIndex.map { case ((name, _), i) =>
            s"<sheet name=\"${esc(name)}\" sheetId=\"${i + 1}\" " +
              s"r:id=\"rId${i + 1}\"/>"
          }.mkString +
          "</sheets></workbook>")
      part("xl/_rels/workbook.xml.rels",
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
          "<Relationships xmlns=\"http://schemas.openxmlformats.org/" +
          "package/2006/relationships\">" +
          (1 to n).map(i =>
            s"<Relationship Id=\"rId$i\" Type=\"http://schemas." +
              "openxmlformats.org/officeDocument/2006/relationships/" +
              s"worksheet\" Target=\"worksheets/sheet$i.xml\"/>").mkString +
          s"<Relationship Id=\"rId${n + 1}\" Type=\"http://schemas." +
          "openxmlformats.org/officeDocument/2006/relationships/styles\" " +
          "Target=\"styles.xml\"/></Relationships>")
      part("xl/styles.xml", stylesXml)
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        val (header, rows, numeric) = render(df)
        part(s"xl/worksheets/sheet${i + 1}.xml",
          sheetXml(header, rows, numeric))
      }
    } finally zip.close()
  }

  // -----------------------------------------------------------------
  // Reader (verification side): enough of SpreadsheetML to read back
  // what `write` emits — inline strings, raw numbers, omitted cells.
  // -----------------------------------------------------------------

  /** Sheet name → worksheet part name, from workbook.xml + rels. */
  private def sheetParts(path: String): Seq[(String, String)] = {
    val wb = new String(readPart(path, "xl/workbook.xml"), UTF_8)
    val sheetRe =
      "<sheet name=\"([^\"]*)\" sheetId=\"\\d+\" r:id=\"rId(\\d+)\"/>".r
    sheetRe.findAllMatchIn(wb).map { m =>
      m.group(1) -> s"xl/worksheets/sheet${m.group(2)}.xml"
    }.toSeq
  }

  private def readPart(path: String, name: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val zin = new ZipInputStream(fs.open(p), UTF_8)
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return out.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    sys.error(s"xlsx part $name not found in $path")
  }

  /** Read one sheet back as (header, rows of nullable strings). Uses
    * the JDK DOM parser — no XML library dependency.
    */
  def readSheet(path: String, sheetName: String): (Seq[String],
      Seq[Seq[String]]) = {
    val partName = sheetParts(path).toMap.getOrElse(sheetName,
      sys.error(s"sheet $sheetName not in $path"))
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new ByteArrayInputStream(readPart(path, partName)))
    val rowNodes = doc.getElementsByTagName("row")
    val parsed = (0 until rowNodes.getLength).map { ri =>
      val row = rowNodes.item(ri).asInstanceOf[org.w3c.dom.Element]
      val cells = row.getElementsByTagName("c")
      (0 until cells.getLength).map { ci =>
        val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
        val ref = c.getAttribute("r").takeWhile(_.isLetter)
        val colIdx = ref.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
        colIdx -> c.getTextContent
      }.toMap
    }
    val header0 = parsed.head
    val nCols = header0.keys.max + 1
    def toRow(m: Map[Int, String]): Seq[String] =
      (0 until nCols).map(i => m.getOrElse(i, null))
    (toRow(header0), parsed.tail.map(toRow))
  }
}
