package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.ingest.{Sources, Xlsx}

/** A2 Excel ingest: write a real (minimal) XLSX with the JDK zip API, read
  * it back through the loader dispatch and the full GSC pipeline path.
  */
class XlsxSpec extends SparkSpecBase {

  private def cell(ref: String, v: String, num: Boolean): String =
    if (num) s"""<c r="$ref"><v>$v</v></c>"""
    else s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""

  /** rows: (ref→(value, isNumeric)) per row. */
  private def writeXlsx(path: String, rows: Seq[Seq[(String, String, Boolean)]]): Unit = {
    val sheetRows = rows.zipWithIndex.map { case (cells, i) =>
      s"""<row r="${i + 1}">""" +
        cells.map { case (colL, v, num) => cell(s"$colL${i + 1}", v, num) }.mkString +
        "</row>"
    }.mkString
    val entries = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$sheetRows</sheetData></worksheet>""".stripMargin)
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
  }

  private lazy val xlsxPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_xlsx").resolve("gsc.xlsx").toString
    writeXlsx(p, Seq(
      Seq(("A", "Top pages", false), ("B", "Clicks", false), ("C", "Impressions", false),
        ("D", "CTR", false), ("E", "Position", false)),
      Seq(("A", "https://www.acme-store.com/products/anvil-1", false), ("B", "120", true),
        ("C", "2400", true), ("D", "5.00%", false), ("E", "2.5", true)),
      // sparse row: CTR (D) missing entirely
      Seq(("A", "https://www.acme-store.com/collections/tools", false), ("B", "30", true),
        ("C", "600", true), ("E", "1.5", true)),
      // third URL row: the value-sniff autodetect needs >= 3 URL-like hits
      // (the reference's own minimum — 2 rows genuinely can't autodetect)
      Seq(("A", "https://www.acme-store.com/pages/contact", false), ("B", "5", true),
        ("C", "100", true), ("D", "5.00%", false), ("E", "6.0", true))))
    p
  }

  test("xlsx parses: header, inline strings, numerics, sparse cells → null") {
    val (header, rows) = Xlsx.readSheet(xlsxPath)
    assert(header == Seq("Top pages", "Clicks", "Impressions", "CTR", "Position"))
    assert(rows.length == 3)
    assert(rows(1)(3).isEmpty) // missing CTR cell → None
    assert(rows(0)(1).contains("120"))
  }

  test("loadTable dispatches .xlsx and the GSC pipeline path works end-to-end") {
    val df = Sources.loadTable(spark, xlsxPath)
    assert(df.columns.length == 5)
    val cfg = Pipeline.PipelineConfig(frogPath = "", gscPath = xlsxPath, ga4Path = "")
    val gsc = Pipeline.loadGsc(spark, cfg).collect()
    assert(gsc.length == 3) // all rows url-like; autodetect resolves 'Top pages'
    val anvil = gsc.find(_.getAs[String]("url").contains("anvil")).get
    assert(anvil.getAs[Double]("clicks") == 120.0)
    assert(anvil.getAs[Double]("ctr") == 0.05) // percent-normalized
    val tools = gsc.find(_.getAs[String]("url").contains("tools")).get
    assert(tools.isNullAt(tools.fieldIndex("ctr"))) // sparse cell stayed null
  }

  test("column reference arithmetic (AA/BC columns)") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA3") == 26)
    assert(Xlsx.colIndex("BC23") == 54)
  }
}
