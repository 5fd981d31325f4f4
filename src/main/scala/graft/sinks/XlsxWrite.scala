package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal XLSX writer (the sink twin of [[graft.ingest.Xlsx]]) — JDK-only
  * (zip + string building), no connector dependency. Writes one worksheet
  * with every cell as an INLINE string (`t="inlineStr"`): no
  * sharedStrings part, so the file is a pure function of the rows — and
  * deterministic byte-for-byte (fixed zip entry timestamps, no metadata
  * parts), which keeps fixture files stable across runs.
  *
  * Scale posture: xlsx is an EXPORT format (config-scale, bounded rows
  * per file) — the distributed path is one file per partition/bucket
  * written driver- or task-side, never one giant sheet. The DSv2 scan
  * ([[graft.sources.excel.DefaultSource]]) reads such a directory back
  * with one input partition per file.
  */
object XlsxWrite {

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c => b.append(c)
    }
    b.toString
  }

  /** 0-based column index → A1-style letters ("A", "Z", "AA", ...). */
  def colLetters(i: Int): String = {
    var n = i + 1
    val b = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; b.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    b.toString
  }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val workbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>""".stripMargin

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** Write `header` + `rows` to `path`. Null cells are OMITTED (sparse
    * row), which the reader surfaces as None/null — the round-trip
    * identity for missing values. Empty strings also read back as None:
    * `read_excel(dtype=str)` parity, where an empty cell is NaN — so
    * "" and null are indistinguishable through this format BY DESIGN.
    */
  def writeXlsx(path: String, header: Seq[String],
      rows: IterableOnce[Seq[String]]): Unit = {
    val sheet = new StringBuilder(1 << 16)
    sheet.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n")
    sheet.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    var rowIdx = 1
    def emitRow(cells: Seq[String]): Unit = {
      sheet.append(s"""<row r="$rowIdx">""")
      cells.zipWithIndex.foreach { case (v, i) =>
        if (v != null)
          sheet.append(s"""<c r="${colLetters(i)}$rowIdx" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
      }
      sheet.append("</row>")
      rowIdx += 1
    }
    emitRow(header)
    rows.iterator.foreach(emitRow)
    sheet.append("</sheetData></worksheet>")

    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)), StandardCharsets.UTF_8)
    def entry(name: String, body: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L) // fixed timestamp: byte-identical output for equal input
      zos.putNextEntry(e)
      zos.write(body.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      entry("[Content_Types].xml", contentTypes)
      entry("_rels/.rels", rootRels)
      entry("xl/workbook.xml", workbook)
      entry("xl/_rels/workbook.xml.rels", workbookRels)
      entry("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }
}
