package graft.ingest

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader (SURVEY §2 A2) — JDK-only (zip + StAX), no
  * connector dependency. Reads the first worksheet with the reference's
  * `read_excel(dtype=str)` semantics: every cell as a string, header from
  * the first row, missing cells → null.
  *
  * Scale posture: XLSX is not a splittable format — this parses on the
  * driver, exactly like the reference's pandas path; it's an ingest format
  * for config-scale exports, not a data-lake format (the engine's canonical
  * storage is parquet).
  *
  * Supported cell types: shared strings (t="s"), inline strings
  * (t="inlineStr"), formula/plain strings (t="str"), booleans, and numeric
  * values (rendered verbatim as stored). Enough for the exports this
  * pipeline ingests; exotic features (date styles, rich text runs beyond
  * concatenation) degrade to the raw stored value.
  */
object Xlsx {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Parse the first sheet: (header, data rows); all cells as Option[String]. */
  def readSheet(path: String): (Seq[String], Seq[Seq[Option[String]]]) =
    readSheetProjected(path, None)

  /** [[readSheet]] with column projection (the DSv2 scan's pushed-down
    * pruning, SURVEY §2 A2): when `required` is set, data-row cells whose
    * header name is NOT in the set are never materialized — no
    * shared-string dereference, no character buffering — and surface as
    * None placeholders (kept only for positional alignment). The header
    * row always parses fully (it DEFINES the name→position map).
    */
  def readSheetProjected(path: String, required: Option[Set[String]])
      : (Seq[String], Seq[Seq[Option[String]]]) = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
      val keepFor: Seq[Option[String]] => Int => Boolean = required match {
        case None => _ => _ => true
        case Some(names) => hdr => {
          val kept = hdr.zipWithIndex.collect {
            case (h, i) if names.contains(h.getOrElse(s"_c$i")) => i
          }.toSet
          kept.contains _
        }
      }
      val rows = parseSheet(zip.getInputStream(sheetEntry), shared, keepFor)
      if (rows.isEmpty) (Seq.empty, Seq.empty)
      else {
        val width = rows.map(_.length).max
        val padded = rows.map(r => r.padTo(width, Option.empty[String]))
        val header = padded.head.zipWithIndex.map { case (h, i) => h.getOrElse(s"_c$i") }
        (header.toSeq, padded.tail.map(_.toSeq))
      }
    } finally zip.close()
  }

  /** Driver-side parse → all-string DataFrame (the A1 CSV contract). */
  def loadXlsx(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) = readSheet(path)
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val data = rows.map(r => Row.fromSeq(r.map(_.orNull)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, math.max(1, rows.length / 10000 + 1)),
      schema)
  }

  /** Header row only — stops the stream after the first `</row>`, so
    * driver-side schema inference never parses a whole workbook. Shared
    * strings still load (headers are usually shared-string cells).
    */
  def readHeader(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
      val in = zip.getInputStream(sheetEntry)
      val r = factory.createXMLStreamReader(in)
      val row = ArrayBuffer.empty[Option[String]]
      var cellCol = -1
      var cellType = ""
      var text: StringBuilder = null
      var collecting = false
      var done = false
      try {
        while (!done && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "c" =>
                  cellCol = Option(r.getAttributeValue(null, "r"))
                    .map(colIndex).getOrElse(row.length)
                  cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
                  text = new StringBuilder
                case "v" | "t" => collecting = text != null
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if collecting =>
              text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "v" | "t" => collecting = false
                case "c" =>
                  val raw = text.toString
                  val value = cellType match {
                    case "s" => shared.lift(raw.trim.toInt)
                    case "b" => Some(if (raw.trim == "1") "TRUE" else "FALSE")
                    case _ => if (raw.isEmpty) None else Some(raw)
                  }
                  while (row.length < cellCol) row += None
                  if (row.length == cellCol) row += value else row(cellCol) = value
                  text = null
                case "row" => done = true
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      row.zipWithIndex.map { case (h, i) => h.getOrElse(s"_c$i") }.toSeq
    } finally zip.close()
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val r = factory.createXMLStreamReader(in)
    var current: StringBuilder = null
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => current = new StringBuilder
              case "t" => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT && current != null =>
            current.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => out += current.toString; current = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** "BC23" → 0-based column index 54. */
  def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  private def parseSheet(in: InputStream, shared: IndexedSeq[String],
      keepFor: Seq[Option[String]] => Int => Boolean = _ => _ => true)
      : Seq[ArrayBuffer[Option[String]]] = {
    val rows = ArrayBuffer.empty[ArrayBuffer[Option[String]]]
    val r = factory.createXMLStreamReader(in)
    var row: ArrayBuffer[Option[String]] = null
    var cellCol = -1
    var cellType = ""
    var text: StringBuilder = null
    var collecting = false
    // identity until the header row closes, then the caller's projection
    var keep: Int => Boolean = _ => true
    var headerDone = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = ArrayBuffer.empty
              case "c" =>
                cellCol = Option(r.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(if (row == null) 0 else row.length)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
                text = if (keep(cellCol)) new StringBuilder else null
              case "v" | "t" => collecting = text != null
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if collecting =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => collecting = false
              case "c" if row != null =>
                val value =
                  if (text == null) None // pruned: never materialized
                  else {
                    val raw = text.toString
                    cellType match {
                      case "s" => shared.lift(raw.trim.toInt)
                      case "b" => Some(if (raw.trim == "1") "TRUE" else "FALSE")
                      case _ => if (raw.isEmpty) None else Some(raw)
                    }
                  }
                while (row.length < cellCol) row += None
                if (row.length == cellCol) row += value else row(cellCol) = value
                text = null
              case "row" =>
                rows += row
                if (!headerDone) { headerDone = true; keep = keepFor(row.toSeq) }
                row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }
}
