package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal legacy `.xls` (BIFF8) reader — JDK-only, closing the last A2
  * ingest gap: the reference's `read_excel` dispatch accepts 97-2003
  * workbooks (`/root/reference/etl_merge.py:96-98` routes any Excel
  * extension through pandas/xlrd); until now the engine rejected them.
  *
  * Same contract as [[Xlsx]]: first worksheet, every cell rendered as a
  * string (`dtype=str` semantics), header from the first row, missing
  * cells → null. Driver-side parse — BIFF is a config-scale export format,
  * not a data-lake format.
  *
  * Two layers, both from the public file-format specs (MS-CFB, MS-XLS):
  *  - the CFB compound container: FAT chains, the mini-FAT for streams
  *    under 4096 bytes, and the directory tree locating the
  *    "Workbook"/"Book" stream;
  *  - the BIFF8 record stream: BOUNDSHEET → first sheet offset; the SST
  *    with its CONTINUE-record splits (a string may split at a character
  *    boundary, re-specifying its encoding byte on the far side); cell
  *    records LABELSST, LABEL, NUMBER, RK, MULRK, BOOLERR and FORMULA
  *    (cached numeric/string results, via the trailing STRING record).
  *
  * Numbers render like the reference's str() of an integral float where
  * exact ("120", not "120.0"), Double.toString otherwise.
  */
object Biff {

  // ---------------------------------------------------------------- CFB ----

  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL

  private final class Cfb(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 &&
      buf.getLong(0) == 0xE11AB1A1E011CFD0L, "not a CFB (OLE2) file")
    private val sectorShift = buf.getShort(30).toInt
    private val sectorSize = 1 << sectorShift
    private val miniShift = buf.getShort(32).toInt
    private val miniSize = 1 << miniShift
    private val nFat = buf.getInt(44)
    private val firstDir = buf.getInt(48) & 0xFFFFFFFFL
    private val miniCutoff = buf.getInt(56)
    private val firstMiniFat = buf.getInt(60) & 0xFFFFFFFFL
    private val firstDifat = buf.getInt(68) & 0xFFFFFFFFL
    private val nDifat = buf.getInt(72)

    // MS-CFB §2.2: sector 0 starts AFTER the fixed 512-byte header, at
    // offset (sid+1)<<shift — which is 512+sid·512 only for the common v3
    // (512-byte) geometry. Writing it spec-form keeps v4 (4096-byte) files
    // parsing instead of silently misreading.
    private def sectorOffset(sid: Long): Int = (sid.toInt + 1) << sectorShift

    /** FAT sector ids: 109 from the header DIFAT + chained DIFAT sectors. */
    private val fatSectors: Seq[Long] = {
      val out = ArrayBuffer.empty[Long]
      var i = 0
      while (i < 109 && out.length < nFat) {
        val v = buf.getInt(76 + i * 4) & 0xFFFFFFFFL
        if (v != FreeSect) out += v
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard <= nDifat) {
        val off = sectorOffset(difat)
        for (j <- 0 until sectorSize / 4 - 1 if out.length < nFat) {
          val v = buf.getInt(off + j * 4) & 0xFFFFFFFFL
          if (v != FreeSect) out += v
        }
        difat = buf.getInt(off + sectorSize - 4) & 0xFFFFFFFFL
        guard += 1
      }
      out.toSeq
    }

    private val fat: Array[Long] = {
      val out = new Array[Long](fatSectors.length * (sectorSize / 4))
      var k = 0
      for (fs <- fatSectors; j <- 0 until sectorSize / 4) {
        out(k) = buf.getInt(sectorOffset(fs) + j * 4) & 0xFFFFFFFFL
        k += 1
      }
      out
    }

    /** Concatenate a regular-FAT chain. */
    private def readChain(start: Long, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard < fat.length + 2) {
        val off = sectorOffset(sid)
        out.write(bytes, off, math.min(sectorSize, bytes.length - off))
        sid = fat(sid.toInt)
        guard += 1
      }
      val all = out.toByteArray
      if (size >= 0 && size < all.length) java.util.Arrays.copyOf(all, size.toInt) else all
    }

    private val dir: Array[Byte] = readChain(firstDir, -1)

    private final case class Entry(name: String, objType: Int, start: Long, size: Long)

    private val entries: Seq[Entry] = (0 until dir.length / 128).map { i =>
      val d = ByteBuffer.wrap(dir, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = math.max(0, (d.getShort(i * 128 + 64) & 0xFFFF) - 2)
      val name = new String(dir, i * 128, math.min(nameLen, 64), StandardCharsets.UTF_16LE)
      Entry(name, dir(i * 128 + 66) & 0xFF,
        d.getInt(i * 128 + 116) & 0xFFFFFFFFL,
        d.getLong(i * 128 + 120) & 0xFFFFFFFFL) // 32-bit sizes are enough here
    }

    private lazy val miniFat: Array[Long] = {
      val raw = readChain(firstMiniFat, -1)
      val mb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(raw.length / 4)(j => mb.getInt(j * 4) & 0xFFFFFFFFL)
    }

    private lazy val miniStream: Array[Byte] = {
      val root = entries.find(_.objType == 5)
        .getOrElse(throw new IllegalArgumentException("CFB: no root entry"))
      readChain(root.start, root.size)
    }

    /** Stream payload by name: mini-FAT chain when under the 4096 cutoff. */
    def stream(names: Seq[String]): Array[Byte] = {
      val e = entries.find(en => en.objType == 2 && names.contains(en.name))
        .getOrElse(throw new IllegalArgumentException(
          s"CFB: no stream named ${names.mkString("/")}; have " +
            entries.filter(_.objType == 2).map(_.name).mkString(",")))
      if (e.size >= miniCutoff) readChain(e.start, e.size)
      else {
        val out = new java.io.ByteArrayOutputStream()
        var sid = e.start
        var guard = 0
        while (sid != EndOfChain && sid != FreeSect && guard < miniFat.length + 2) {
          val off = (sid * miniSize).toInt
          out.write(miniStream, off, math.min(miniSize, miniStream.length - off))
          sid = miniFat(sid.toInt)
          guard += 1
        }
        java.util.Arrays.copyOf(out.toByteArray, e.size.toInt)
      }
    }
  }

  // --------------------------------------------------------------- BIFF ----

  private object RT {
    val Bof = 0x0809; val Eof = 0x000A; val BoundSheet = 0x0085
    val Sst = 0x00FC; val Continue = 0x003C
    val LabelSst = 0x00FD; val Label = 0x0204; val Number = 0x0203
    val Rk = 0x027E; val MulRk = 0x00BD; val BoolErr = 0x0205
    val Formula = 0x0006; val StringRec = 0x0207
  }

  /** Cursor over a run of record payloads (SST + its CONTINUEs): reading
    * past a payload advances into the next; a string's character data that
    * splits at the boundary re-reads its 1-byte encoding flag there.
    */
  private final class Cursor(parts: IndexedSeq[Array[Byte]]) {
    private var p = 0
    private var o = 0
    private def ensure(): Unit =
      while (p < parts.length && o >= parts(p).length) { p += 1; o = 0 }
    def u8(): Int = { ensure(); val v = parts(p)(o) & 0xFF; o += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = (u16().toLong) | (u16().toLong << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) { ensure(); val take = math.min(left, parts(p).length - o); o += take; left -= take }
    }
    /** BIFF8 unicode char run: `cch` chars already-announced `wide` or
      * compressed; on a CONTINUE boundary the encoding byte re-specifies.
      */
    def chars(cch: Int, wide0: Boolean): String = {
      ensure()
      val sb = new StringBuilder(cch)
      var wide = wide0
      var curPart = p
      var left = cch
      while (left > 0) {
        ensure()
        if (p != curPart) { wide = (u8() & 1) == 1; curPart = p } // flag re-specified per CONTINUE
        val bytesPerChar = if (wide) 2 else 1
        val avail = (parts(p).length - o) / bytesPerChar
        val take = math.min(left, math.max(avail, 0))
        if (take == 0) { o = parts(p).length } // defensive: skip ragged tail
        else {
          if (wide) {
            sb.append(new String(parts(p), o, take * 2, StandardCharsets.UTF_16LE))
          } else {
            var i = 0
            while (i < take) { sb.append((parts(p)(o + i) & 0xFF).toChar); i += 1 }
          }
          o += take * bytesPerChar
          left -= take
        }
      }
      sb.toString
    }
  }

  /** One BIFF8 XLUnicodeRichExtendedString (SST layout). */
  private def readSstString(c: Cursor): String = {
    val cch = c.u16()
    val grbit = c.u8()
    val wide = (grbit & 0x01) == 1
    val rich = (grbit & 0x08) != 0
    val ext = (grbit & 0x04) != 0
    val cRun = if (rich) c.u16() else 0
    val cbExt = if (ext) c.u32() else 0L
    val s = c.chars(cch, wide)
    c.skip(cRun * 4)
    c.skip(cbExt.toInt)
    s
  }

  /** Short form used by BOUNDSHEET/LABEL/STRING (16-bit cch for the latter
    * two, 8-bit for sheet names — caller passes cch).
    */
  private def readUnicodeString(c: Cursor, cch: Int): String = {
    val grbit = c.u8()
    c.chars(cch, (grbit & 0x01) == 1)
  }

  private def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def decodeRk(rk: Long): String = {
    val div100 = (rk & 1L) != 0
    val isInt = (rk & 2L) != 0
    val d =
      if (isInt) (rk.toInt >> 2).toDouble // sign-propagating 30-bit int
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    renderNum(if (div100) d / 100.0 else d)
  }

  /** Parse the first worksheet of a BIFF8 workbook stream:
    * (header, data rows), all cells as Option[String].
    */
  def readSheetBytes(wb: Array[Byte]): (Seq[String], Seq[Seq[Option[String]]]) = {
    val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    // pass 1: workbook globals — SST and the first BOUNDSHEET offset
    var sst = IndexedSeq.empty[String]
    var sheetOffset = -1
    var off = 0
    var done = false
    while (!done && off + 4 <= wb.length) {
      val typ = buf.getShort(off) & 0xFFFF
      val len = buf.getShort(off + 2) & 0xFFFF
      typ match {
        case RT.BoundSheet if sheetOffset < 0 =>
          sheetOffset = buf.getInt(off + 4)
        case RT.Sst =>
          // gather SST payload + all immediately following CONTINUEs
          val parts = ArrayBuffer(java.util.Arrays.copyOfRange(wb, off + 4, off + 4 + len))
          var o2 = off + 4 + len
          while (o2 + 4 <= wb.length && (buf.getShort(o2) & 0xFFFF) == RT.Continue) {
            val l2 = buf.getShort(o2 + 2) & 0xFFFF
            parts += java.util.Arrays.copyOfRange(wb, o2 + 4, o2 + 4 + l2)
            o2 += 4 + l2
          }
          val c = new Cursor(parts.toIndexedSeq)
          c.skip(4) // cstTotal
          val unique = c.u32()
          sst = (0L until unique).map(_ => readSstString(c)).toIndexedSeq
        case RT.Eof => done = true
        case _ =>
      }
      off += 4 + len
    }
    require(sheetOffset >= 0, "BIFF: no BOUNDSHEET record")

    // pass 2: the sheet substream — cell records until EOF
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(r: Int, col: Int, v: String): Unit = {
      cells((r, col)) = v
      if (r > maxRow) maxRow = r
      if (col > maxCol) maxCol = col
    }
    off = sheetOffset
    done = false
    var pendingStringCell: Option[(Int, Int)] = None
    while (!done && off + 4 <= wb.length) {
      val typ = buf.getShort(off) & 0xFFFF
      val len = buf.getShort(off + 2) & 0xFFFF
      val body = off + 4
      typ match {
        case RT.Eof => done = true
        case RT.LabelSst =>
          val idx = buf.getInt(body + 6)
          put(buf.getShort(body) & 0xFFFF, buf.getShort(body + 2) & 0xFFFF,
            if (idx >= 0 && idx < sst.length) sst(idx) else "")
        case RT.Label =>
          val cch = buf.getShort(body + 6) & 0xFFFF
          val c = new Cursor(IndexedSeq(
            java.util.Arrays.copyOfRange(wb, body + 8, body + len)))
          put(buf.getShort(body) & 0xFFFF, buf.getShort(body + 2) & 0xFFFF,
            readUnicodeString(c, cch))
        case RT.Number =>
          put(buf.getShort(body) & 0xFFFF, buf.getShort(body + 2) & 0xFFFF,
            renderNum(buf.getDouble(body + 6)))
        case RT.Rk =>
          put(buf.getShort(body) & 0xFFFF, buf.getShort(body + 2) & 0xFFFF,
            decodeRk(buf.getInt(body + 6) & 0xFFFFFFFFL))
        case RT.MulRk =>
          val row = buf.getShort(body) & 0xFFFF
          val colFirst = buf.getShort(body + 2) & 0xFFFF
          val n = (len - 6) / 6
          for (i <- 0 until n)
            put(row, colFirst + i, decodeRk(buf.getInt(body + 4 + i * 6 + 2) & 0xFFFFFFFFL))
        case RT.BoolErr =>
          val isErr = (wb(body + 7) & 0xFF) != 0
          if (!isErr)
            put(buf.getShort(body) & 0xFFFF, buf.getShort(body + 2) & 0xFFFF,
              if ((wb(body + 6) & 0xFF) == 1) "TRUE" else "FALSE")
        case RT.Formula =>
          val row = buf.getShort(body) & 0xFFFF
          val col = buf.getShort(body + 2) & 0xFFFF
          if ((buf.getShort(body + 12) & 0xFFFF) == 0xFFFF) {
            (wb(body + 6) & 0xFF) match {
              case 0 => pendingStringCell = Some((row, col)) // STRING follows
              case 1 => put(row, col, if ((wb(body + 8) & 0xFF) == 1) "TRUE" else "FALSE")
              case _ => // error result → leave missing
            }
          } else put(row, col, renderNum(buf.getDouble(body + 6)))
        case RT.StringRec =>
          pendingStringCell.foreach { case (r, cIdx) =>
            val cch = buf.getShort(body) & 0xFFFF
            val c = new Cursor(IndexedSeq(
              java.util.Arrays.copyOfRange(wb, body + 2, body + len)))
            put(r, cIdx, readUnicodeString(c, cch))
          }
          pendingStringCell = None
        case _ =>
      }
      off += 4 + len
    }

    if (maxRow < 0) (Seq.empty, Seq.empty)
    else {
      val grid = (0 to maxRow).map(r => (0 to maxCol).map(c => cells.get((r, c))))
      val header = grid.head.zipWithIndex.map { case (h, i) => h.getOrElse(s"_c$i") }
      (header, grid.tail)
    }
  }

  /** Parse the first sheet of an `.xls` file on disk. */
  def readSheet(path: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    readSheetBytes(new Cfb(bytes).stream(Seq("Workbook", "Book")))
  }

  /** Driver-side parse → all-string DataFrame (the A1 CSV contract). */
  def loadXls(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) = readSheet(path)
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val data = rows.map(r => Row.fromSeq(r.map(_.orNull)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, rows.length / 10000 + 1)),
      schema)
  }
}
