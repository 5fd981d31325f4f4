package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.ingest.{Biff, Sources}

/** A2 legacy `.xls` ingest: build real BIFF8-in-CFB files with an
  * independent writer (mini-FAT layout for the realistic small-export case,
  * regular-FAT for the ≥4096-byte case), then read them back through
  * Biff.readSheet and the loader dispatch. The SST is written with a string
  * deliberately split across a CONTINUE boundary that switches encoding
  * (compressed → UTF-16) — the nastiest corner of the format.
  */
class BiffSpec extends SparkSpecBase {

  // ------------------------------------------------------ tiny LE writer --

  private final class W {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): W = { out.write(v & 0xFF); this }
    def u16(v: Int): W = { u8(v); u8(v >> 8) }
    def u32(v: Long): W = { u16(v.toInt & 0xFFFF); u16((v >> 16).toInt & 0xFFFF) }
    def f64(v: Double): W = {
      val bits = java.lang.Double.doubleToLongBits(v)
      u32(bits & 0xFFFFFFFFL); u32(bits >>> 32)
    }
    def bytes(b: Array[Byte]): W = { out.write(b); this }
    def ascii(s: String): W = { out.write(s.getBytes(StandardCharsets.US_ASCII)); this }
    def result: Array[Byte] = out.toByteArray
  }

  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] =
    new W().u16(typ).u16(payload.length).bytes(payload).result

  // ------------------------------------------------- BIFF8 record stream --

  /** Workbook stream: globals (BOF, BOUNDSHEET, SST+CONTINUE, EOF) + one
    * sheet substream exercising every supported cell record.
    */
  private def workbookStream: Array[Byte] = {
    val bofGlobals = rec(0x0809,
      new W().u16(0x0600).u16(0x0005).u16(0).u16(0).u32(0).u32(0).result)
    val bofSheet = rec(0x0809,
      new W().u16(0x0600).u16(0x0010).u16(0).u16(0).u32(0).u32(0).result)

    // SST: 6 strings; "CTR Percent" split across a CONTINUE after "CTR " with
    // the continuation re-specifying wide (UTF-16LE) encoding
    val sstStrings = Seq("Top pages", "Clicks", "Impressions", "Position",
      "https://www.acme-store.com/products/anvil-1")
    val sstBody = new W().u32(6).u32(6)
    for (s <- sstStrings)
      sstBody.u16(s.length).u8(0).ascii(s)
    sstBody.u16(11).u8(0).ascii("CTR ") // "CTR Percent": 4 of 11 chars here
    val continueBody = new W().u8(1)
      .bytes("Percent".getBytes(StandardCharsets.UTF_16LE)).result
    val sst = rec(0x00FC, sstBody.result) ++ rec(0x003C, continueBody)

    val eof = rec(0x000A, Array.emptyByteArray)

    // sheet cells (ixfe always 0)
    def labelSst(r: Int, c: Int, i: Int) =
      rec(0x00FD, new W().u16(r).u16(c).u16(0).u32(i).result)
    def number(r: Int, c: Int, v: Double) =
      rec(0x0203, new W().u16(r).u16(c).u16(0).f64(v).result)
    def rkInt(r: Int, c: Int, v: Int) =
      rec(0x027E, new W().u16(r).u16(c).u16(0).u32((v.toLong << 2) | 2).result)
    def rkDiv100(r: Int, c: Int, cents: Int) =
      rec(0x027E, new W().u16(r).u16(c).u16(0).u32((cents.toLong << 2) | 3).result)
    def rkDouble(r: Int, c: Int, v: Double) = {
      val hi = java.lang.Double.doubleToLongBits(v) >>> 32
      rec(0x027E, new W().u16(r).u16(c).u16(0).u32(hi & 0xFFFFFFFCL).result)
    }
    def mulRk(r: Int, cFirst: Int, vs: Seq[Int]) = {
      val w = new W().u16(r).u16(cFirst)
      vs.foreach(v => w.u16(0).u32((v.toLong << 2) | 2))
      rec(0x00BD, w.u16(cFirst + vs.length - 1).result)
    }
    def boolCell(r: Int, c: Int, v: Boolean) =
      rec(0x0205, new W().u16(r).u16(c).u16(0).u8(if (v) 1 else 0).u8(0).result)
    def labelInline(r: Int, c: Int, s: String) =
      rec(0x0204, new W().u16(r).u16(c).u16(0).u16(s.length).u8(0).ascii(s).result)
    def formulaNum(r: Int, c: Int, v: Double) =
      rec(0x0006, new W().u16(r).u16(c).u16(0).f64(v).u16(0).u32(0).result)
    def formulaStr(r: Int, c: Int, s: String) =
      rec(0x0006, new W().u16(r).u16(c).u16(0)
        .u8(0).u8(0).u32(0).u16(0xFFFF).u16(0).u32(0).result) ++
        rec(0x0207, new W().u16(s.length).u8(0).ascii(s).result)

    val sheet = bofSheet ++
      // header row: last header via the CONTINUE-split SST entry
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      labelSst(0, 3, 5) ++ labelSst(0, 4, 3) ++
      // row 1: url, rk-int clicks, number imps, inline label ctr, rk-double pos
      labelSst(1, 0, 4) ++ rkInt(1, 1, 120) ++ number(1, 2, 2400.0) ++
      labelInline(1, 3, "5.00%") ++ rkDouble(1, 4, 2.5) ++
      // row 2: sparse (no CTR) + MULRK pair + formula-number position
      labelInline(2, 0, "/collections/tools") ++ mulRk(2, 1, Seq(30, 600)) ++
      formulaNum(2, 4, 1.5) ++
      // row 3: rk div100, formula string, bool
      labelInline(3, 0, "/pages/contact") ++ rkDiv100(3, 1, 123) ++
      number(3, 2, 100.0) ++ formulaStr(3, 3, "6.10%") ++ boolCell(3, 4, true) ++
      eof

    val boundSheetBody = new W()
    boundSheetBody.u32(0) // sheet BOF offset — backpatched below
    boundSheetBody.u8(0).u8(0).u8(6).u8(0).ascii("Sheet1")
    val globalsNoPatch = bofGlobals ++ rec(0x0085, boundSheetBody.result) ++ sst ++ eof
    val sheetOffset = globalsNoPatch.length
    // backpatch BOUNDSHEET.lbPlyPos (4 bytes after its record header)
    val patched = globalsNoPatch.clone()
    val bsPos = bofGlobals.length + 4
    patched(bsPos) = (sheetOffset & 0xFF).toByte
    patched(bsPos + 1) = ((sheetOffset >> 8) & 0xFF).toByte
    patched(bsPos + 2) = ((sheetOffset >> 16) & 0xFF).toByte
    patched(bsPos + 3) = ((sheetOffset >> 24) & 0xFF).toByte
    patched ++ sheet
  }

  // ------------------------------------------------------------ CFB shell --

  private val End = 0xFFFFFFFEL
  private val Free = 0xFFFFFFFFL
  private val FatSect = 0xFFFFFFFDL

  private def dirEntry(name: String, objType: Int, start: Long, size: Long): Array[Byte] = {
    val w = new W()
    val n = name.getBytes(StandardCharsets.UTF_16LE)
    w.bytes(n).bytes(new Array[Byte](64 - n.length))
    w.u16(n.length + 2).u8(objType).u8(1) // color: black
    w.u32(Free).u32(Free).u32(if (objType == 5) 1L else Free) // left/right/child
    w.bytes(new Array[Byte](36)) // clsid + state + timestamps
    w.u32(start).u32(size).u32(0)
    val b = w.result
    require(b.length == 128, s"dir entry ${b.length}")
    b
  }

  private def sectorPad(b: Array[Byte]): Array[Byte] =
    b ++ new Array[Byte]((512 - b.length % 512) % 512)

  /** Assemble a single-stream CFB; mini-FAT layout iff payload < 4096. */
  private def writeCfb(path: String, payload: Array[Byte]): Unit = {
    val mini = payload.length < 4096
    val fat = new W()
    val body = new ByteArrayOutputStream()
    if (mini) {
      val miniSectors = (payload.length + 63) / 64
      val miniStream = payload ++ new Array[Byte](miniSectors * 64 - payload.length)
      val containerSectors = (miniStream.length + 511) / 512
      // sectors: 0=FAT, 1=dir, 2=miniFAT, 3..=mini-stream container
      fat.u32(FatSect).u32(End).u32(End)
      for (i <- 0 until containerSectors)
        fat.u32(if (i == containerSectors - 1) End else 4L + i)
      val fatSector = sectorPad(fat.result ++
        Array.fill((512 - (3 + containerSectors) * 4) / 4)(0: Byte).flatMap(_ =>
          new W().u32(Free).result))
      val dir = sectorPad(
        dirEntry("Root Entry", 5, 3, miniStream.length.toLong) ++
          dirEntry("Workbook", 2, 0, payload.length.toLong))
      val miniFatW = new W()
      for (i <- 0 until miniSectors)
        miniFatW.u32(if (i == miniSectors - 1) End else i + 1L)
      for (_ <- miniSectors until 128) miniFatW.u32(Free)
      body.write(fatSector); body.write(dir); body.write(miniFatW.result)
      body.write(sectorPad(miniStream))
      writeHeader(path, body.toByteArray, firstMiniFat = 2, nMiniFat = 1)
    } else {
      val payloadSectors = (payload.length + 511) / 512
      require(payloadSectors <= 125, "test writer: one FAT sector only")
      // sectors: 0=FAT, 1=dir, 2..=payload
      fat.u32(FatSect).u32(End)
      for (i <- 0 until payloadSectors)
        fat.u32(if (i == payloadSectors - 1) End else 3L + i)
      for (_ <- (2 + payloadSectors) until 128) fat.u32(Free)
      val dir = sectorPad(
        dirEntry("Root Entry", 5, End, 0L) ++
          dirEntry("Workbook", 2, 2, payload.length.toLong))
      body.write(fat.result); body.write(dir); body.write(sectorPad(payload))
      writeHeader(path, body.toByteArray, firstMiniFat = End, nMiniFat = 0)
    }
  }

  /** Version-4 CFB (4096-byte sectors, major=4): the geometry where the
    * naive `512 + (sid << shift)` offset formula breaks — sector 0 starts
    * at byte 4096 (the 512-byte header pads to a full sector), so every
    * sector offset must come from the spec form `(sid+1) << shift`.
    * Regular-FAT single-stream layout: sector 0 = FAT, 1 = directory,
    * 2.. = payload.
    */
  private def writeCfbV4(path: String, payload: Array[Byte]): Unit = {
    val SS = 4096
    def pad(b: Array[Byte]) = b ++ new Array[Byte]((SS - b.length % SS) % SS)
    val payloadSectors = (payload.length + SS - 1) / SS
    require(2 + payloadSectors <= SS / 4, "test writer: one FAT sector only")
    val fat = new W()
    fat.u32(FatSect).u32(End)
    for (i <- 0 until payloadSectors)
      fat.u32(if (i == payloadSectors - 1) End else 3L + i)
    for (_ <- (2 + payloadSectors) until SS / 4) fat.u32(Free)
    val dir = pad(dirEntry("Root Entry", 5, End, 0L) ++
      dirEntry("Workbook", 2, 2, payload.length.toLong))
    val h = new W()
    h.u32(0xE011CFD0L).u32(0xE11AB1A1L) // magic
    h.bytes(new Array[Byte](16)) // clsid
    h.u16(0x3E).u16(4).u16(0xFFFE) // minor, major=4, little-endian
    h.u16(12).u16(6) // sector 4096, mini 64
    h.bytes(new Array[Byte](6)).u32(1) // reserved, nDir (v4: counted)
    h.u32(1) // one FAT sector
    h.u32(1) // first directory sector
    h.u32(0) // transaction
    h.u32(4096) // mini cutoff
    h.u32(End).u32(0) // no mini FAT
    h.u32(End).u32(0) // no DIFAT chain
    h.u32(0) // DIFAT[0] = FAT at sector 0
    for (_ <- 1 until 109) h.u32(Free)
    val header = h.result
    require(header.length == 512, s"header ${header.length}")
    // v4: the header occupies a full 4096-byte sector (512 real + zero pad)
    Files.write(Paths.get(path),
      header ++ new Array[Byte](SS - 512) ++ fat.result ++ dir ++ pad(payload))
  }

  private def writeHeader(path: String, body: Array[Byte],
      firstMiniFat: Long, nMiniFat: Int): Unit = {
    val h = new W()
    h.u32(0xE011CFD0L).u32(0xE11AB1A1L) // magic
    h.bytes(new Array[Byte](16)) // clsid
    h.u16(0x3E).u16(3).u16(0xFFFE) // minor, major=3, little-endian
    h.u16(9).u16(6) // sector 512, mini 64
    h.bytes(new Array[Byte](6)).u32(0) // reserved, nDir (v3: 0)
    h.u32(1) // one FAT sector
    h.u32(1) // first directory sector
    h.u32(0) // transaction
    h.u32(4096) // mini cutoff
    h.u32(firstMiniFat).u32(nMiniFat.toLong)
    h.u32(End).u32(0) // no DIFAT chain
    h.u32(0) // DIFAT[0] = FAT at sector 0
    for (_ <- 1 until 109) h.u32(Free)
    val header = h.result
    require(header.length == 512, s"header ${header.length}")
    Files.write(Paths.get(path), header ++ body)
  }

  private lazy val xlsPath: String = {
    val p = Files.createTempDirectory("graft_xls").resolve("gsc.xls").toString
    writeCfb(p, workbookStream)
    p
  }

  private lazy val bigXlsPath: String = {
    val p = Files.createTempDirectory("graft_xls_big").resolve("gsc_big.xls").toString
    // pad past the 4096 mini cutoff: bytes after the sheet EOF are never read
    writeCfb(p, workbookStream ++ new Array[Byte](8192))
    p
  }

  private def expect(rows: Seq[Seq[Option[String]]]): Unit = {
    assert(rows.length == 3)
    assert(rows(0) == Seq(Some("https://www.acme-store.com/products/anvil-1"),
      Some("120"), Some("2400"), Some("5.00%"), Some("2.5")))
    assert(rows(1) == Seq(Some("/collections/tools"), Some("30"), Some("600"),
      None, Some("1.5"))) // sparse CTR cell → null; MULRK pair; formula number
    assert(rows(2) == Seq(Some("/pages/contact"), Some("1.23"), Some("100"),
      Some("6.10%"), Some("TRUE"))) // RK div-100; formula string; bool
  }

  test("xls (mini-FAT layout): header incl. CONTINUE-split SST string, all cell kinds") {
    val (header, rows) = Biff.readSheet(xlsPath)
    assert(header == Seq("Top pages", "Clicks", "Impressions", "CTR Percent", "Position"))
    expect(rows)
  }

  test("xls (regular-FAT layout, >=4096 bytes): identical parse") {
    val (header, rows) = Biff.readSheet(bigXlsPath)
    assert(header == Seq("Top pages", "Clicks", "Impressions", "CTR Percent", "Position"))
    expect(rows)
  }

  test("xls in a v4 CFB container (4096-byte sectors): identical parse") {
    val p = Files.createTempDirectory("graft_xls_v4").resolve("gsc_v4.xls").toString
    writeCfbV4(p, workbookStream ++ new Array[Byte](8192))
    val (header, rows) = Biff.readSheet(p)
    assert(header == Seq("Top pages", "Clicks", "Impressions", "CTR Percent", "Position"))
    expect(rows)
  }

  test("property: random grids (unicode strings, ints, holes) round-trip " +
    "through writer/reader") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    def labelCell(r: Int, c: Int, s: String): Array[Byte] = {
      val wide = s.exists(_ > 127)
      val w = new W().u16(r).u16(c).u16(0).u16(s.length).u8(if (wide) 1 else 0)
      if (wide) w.bytes(s.getBytes(StandardCharsets.UTF_16LE)) else w.ascii(s)
      rec(0x0204, w.result)
    }
    def intCell(r: Int, c: Int, v: Long): Array[Byte] =
      rec(0x027E, new W().u16(r).u16(c).u16(0).u32(((v << 2) | 2) & 0xFFFFFFFFL).result)
    val strGen = Gen.nonEmptyListOf(
      Gen.frequency(6 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', '中', 'ß', ' ')))
      .map(_.mkString.take(12))
    val cellGen: Gen[Option[Either[String, Long]]] = Gen.frequency(
      2 -> Gen.const(None),
      4 -> strGen.map(s => Some(Left(s))),
      3 -> Gen.choose(-1000000L, 1000000L).map(v => Some(Right(v))))
    for (seed <- 0 until 25) {
      val nCols = sample(Gen.choose(1, 5), seed * 31 + 1)
      val nRows = sample(Gen.choose(1, 6), seed * 31 + 2)
      val header = (0 until nCols).map(c => s"h${c}_" + sample(strGen, seed * 31 + 3 + c))
      val data = (0 until nRows).map(r =>
        (0 until nCols).map(c => sample(cellGen, seed * 1009 + r * 31 + c)))
      val body = header.zipWithIndex.map { case (h, c) => labelCell(0, c, h) } ++
        data.zipWithIndex.flatMap { case (row, r) => row.zipWithIndex.collect {
          case (Some(Left(s)), c) => labelCell(r + 1, c, s)
          case (Some(Right(v)), c) => intCell(r + 1, c, v)
        } }
      val bofSheet = rec(0x0809,
        new W().u16(0x0600).u16(0x0010).u16(0).u16(0).u32(0).u32(0).result)
      val bofGlobals = rec(0x0809,
        new W().u16(0x0600).u16(0x0005).u16(0).u16(0).u32(0).u32(0).result)
      val eof = rec(0x000A, Array.emptyByteArray)
      val bs = new W(); bs.u32(0); bs.u8(0).u8(0).u8(2).u8(0).ascii("S1")
      val globals = bofGlobals ++ rec(0x0085, bs.result) ++ eof
      val patched = globals.clone()
      val pos = bofGlobals.length + 4
      val so = globals.length
      patched(pos) = (so & 0xFF).toByte; patched(pos + 1) = ((so >> 8) & 0xFF).toByte
      patched(pos + 2) = ((so >> 16) & 0xFF).toByte; patched(pos + 3) = ((so >> 24) & 0xFF).toByte
      val wb = patched ++ bofSheet ++ body.flatten ++ eof
      val p = Files.createTempDirectory("graft_xls_prop").resolve(s"g$seed.xls").toString
      writeCfb(p, wb)
      val (gotHeader, gotRows) = Biff.readSheet(p)
      // reader semantics: trailing all-empty data rows vanish (no cell records)
      val expected = data.map(_.map(_.map(_.fold(identity, _.toString))))
        .reverse.dropWhile(_.forall(_.isEmpty)).reverse
      assert(gotHeader == header, s"seed=$seed header $gotHeader != $header")
      assert(gotRows == expected, s"seed=$seed rows $gotRows != $expected")
    }
  }

  test("loadTable dispatches .xls to the BIFF reader") {
    val df = Sources.loadTable(spark, xlsPath)
    assert(df.columns.toSeq ==
      Seq("Top pages", "Clicks", "Impressions", "CTR Percent", "Position"))
    assert(df.count() == 3)
    val anvil = df.filter(df("Top pages").contains("anvil")).collect().head
    assert(anvil.getString(1) == "120" && anvil.getString(3) == "5.00%")
  }
}
