package graft

import java.nio.file.Files

import graft.runner.ValidationRunner
import graft.schema._
import graft.sources.{TableSource, XlsxSource}

/** Excel (xlsx) reader: reference semantics from jobs.py:272-294 — header-
  * less read (header is data row 1), single-worksheet invariant, format-
  * error taxonomy — plus writer round-trips over both OOXML string
  * encodings (inline + shared) and sparse cells/rows. */
class XlsxSpec extends SparkSpec {

  private def fc = FieldConstraints()

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_xlsx").resolve(name).toString

  private val grid: Seq[Seq[String]] = Seq(
    Seq("id", "name", "score"),
    Seq("1", "alpha", "3.5"),
    Seq("2", "beta <&> \"quoted\"", "4"),
    Seq("3", "gamma", "-7")
  )

  test("round trip: inline strings, numbers kept in stored lexical form") {
    val path = tmp("t.xlsx")
    XlsxSource.writeXlsx(path, Seq(("Sheet1", grid)))
    val table = XlsxSource.readXlsx(spark, path).toOption.get
    assert(table.headers == Seq("id", "name", "score"))
    val rows = table.df.orderBy("_row_number").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(3)).toSeq == Seq(2L, 3L, 4L)) // header is row 1
    assert(rows(0).getString(2) == "3.5")
    assert(rows(1).getString(1) == "beta <&> \"quoted\"") // XML escaping round-trips
    assert(rows(2).getString(2) == "-7")
  }

  test("round trip: sharedStrings encoding reads identically to inline") {
    val p1 = tmp("inline.xlsx"); val p2 = tmp("shared.xlsx")
    XlsxSource.writeXlsx(p1, Seq(("S", grid)), useSharedStrings = false)
    XlsxSource.writeXlsx(p2, Seq(("S", grid)), useSharedStrings = true)
    val a = XlsxSource.readXlsx(spark, p1).toOption.get.df.orderBy("_row_number").collect().toSeq
    val b = XlsxSource.readXlsx(spark, p2).toOption.get.df.orderBy("_row_number").collect().toSeq
    assert(a == b)
  }

  test("multiple worksheets rejected with the reference message (jobs.py:287-292)") {
    val path = tmp("two.xlsx")
    XlsxSource.writeXlsx(path, Seq(("A", grid), ("B", grid)))
    XlsxSource.readXlsx(spark, path) match {
      case Left(e: TableSource.SourceContentError) =>
        assert(e.message == "Your Excel file must contain only one worksheet for validation.")
      case other => fail(s"expected single-worksheet rejection, got $other")
    }
  }

  test("garbage payload → format-error with the reference message (jobs.py:278-285)") {
    val path = tmp("junk.xlsx")
    Files.write(java.nio.file.Paths.get(path), "this is not a zip".getBytes)
    XlsxSource.readXlsx(spark, path) match {
      case Left(e: TableSource.FormatError) =>
        assert(e.message ==
          "Could not read your Excel file. Are you sure your specified format (xlsx) is correct?")
      case other => fail(s"expected format-error, got $other")
    }
  }

  test("sparse cells preserve column positions; short header pads to max width") {
    val path = tmp("sparse.xlsx")
    XlsxSource.writeXlsx(path, Seq(("S", Seq(Seq("a", "b"), Seq(null, null, "x")))))
    val table = XlsxSource.readXlsx(spark, path).toOption.get
    assert(table.headers == Seq("a", "b", null)) // padded to max width → blank-header downstream
    val r = table.df.orderBy("_row_number").collect()(0)
    assert(r.getString(0) == null && r.getString(1) == null && r.getString(2) == "x")
  }

  test("dispatch: xlsx and xls route to the Excel reader") {
    assert(TableSource.formatOf("data.xlsx") == Right("xlsx"))
    assert(TableSource.formatOf("data.xls") == Right("xlsx"))
  }

  test("runXlsx end-to-end: schema violations from a workbook (same pipeline as CSV)") {
    val path = tmp("val.xlsx")
    val g = Seq(
      Seq("id", "region"),
      Seq("1", "2"),
      Seq("2", "4"), // > maximum 3
      Seq("3", "9")  // > maximum 3
    )
    XlsxSource.writeXlsx(path, Seq(("S", g)))
    val schema = TableSchema(Seq(
      Field("id", ftype = "integer"),
      Field("region", ftype = "integer", constraints = fc.copy(maximum = Some(3.0)))
    ))
    val (report, status) = ValidationRunner.runXlsx(spark, path, schema)
    assert(status == "failure")
    val errs = report.tables.head.errors
    assert(errs.map(_.code).toSet == Set("maximum-constraint"))
    assert(errs.map(_.rowNumber.get).sorted == Seq(3L, 4L))
    assert(report.tables.head.rowCount == 4) // header + 3 data rows
  }

  test("property: arbitrary grids round-trip through write → parse (both encodings)") {
    val specials = "&<>\"'\t\n\r é中" // XML specials, ws, unicode, a control char
    def randomCell(r: scala.util.Random): String = r.nextInt(6) match {
      case 0 => null
      case 1 => r.nextInt(2000).toString // numeric-cell path
      case 2 => (r.nextDouble() * 100 - 50).toString.take(9)
      case 3 => "" // empty string
      case _ => (0 to r.nextInt(12)).map(_ => specials(r.nextInt(specials.length))).mkString
    }
    // writer sanitization applied to the EXPECTED value: control chars
    // (except tab/LF/CR) are stripped — XML 1.0 cannot carry them
    def sanitize(s: String): String =
      if (s == null) null else s.filter(c => c >= ' ' || c == '\t' || c == '\n' || c == '\r')
    for (seed <- 1 to 5; shared <- Seq(false, true)) {
      val r = new scala.util.Random(seed)
      val rows = 1 + r.nextInt(8)
      val cols = 1 + r.nextInt(5)
      val header = (0 until cols).map(i => s"h$i")
      val grid = header +: (0 until rows).map(_ => (0 until cols).map(_ => randomCell(r)))
      val path = tmp(s"prop_${seed}_$shared.xlsx")
      XlsxSource.writeXlsx(path, Seq(("S", grid.map(_.toSeq))), useSharedStrings = shared)
      val table = XlsxSource.readXlsx(spark, path).fold(e => fail(e.message), identity)
      val got = table.df.orderBy("_row_number").collect()
        .map(row => (0 until cols).map(i => row.getString(i)))
      val expected = grid.drop(1).map(_.map(sanitize))
      def show(x: String) = if (x == null) "NULL" else "[" + x.flatMap(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString) + "]"
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        if (g.toList != e.toList)
          info(s"DIFFROW seed=$seed shared=$shared row=$i GOT=${g.map(show)} EXP=${e.map(show)}")
      }
      assert(got.map(_.toList).toList == expected.map(_.toList).toList, s"seed=$seed shared=$shared")
    }
  }

  test("runXlsx on an unreadable workbook → zero-table ERROR report") {
    val path = tmp("bad.xlsx")
    Files.write(java.nio.file.Paths.get(path), Array[Byte](1, 2, 3))
    val (report, status) = ValidationRunner.runXlsx(spark, path, TableSchema(Seq(Field("a"))))
    assert(status == "error")
    assert(report.tables.isEmpty)
  }

  test("legacy BIFF (.xls) round trip: writeXls → CFB+BIFF8 parse reads like the xlsx path") {
    // the reference reads BIFF via pandas/xlrd (settings.py:6 lists xls);
    // the OLE2 magic (D0 CF 11 E0) routes the payload to BiffSource
    val path = tmp("legacy.xls")
    graft.sources.BiffSource.writeXls(path, Seq(("Sheet1", grid)))
    val table = XlsxSource.readXlsx(spark, path).fold(e => fail(e.message), identity)
    assert(table.headers == Seq("id", "name", "score"))
    val rows = table.df.orderBy("_row_number").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(3)).toSeq == Seq(2L, 3L, 4L)) // header is row 1
    assert(rows(0).getString(2) == "3.5")
    assert(rows(1).getString(1) == "beta <&> \"quoted\"") // SST round-trips raw text
    assert(rows(2).getString(2) == "-7") // RK/NUMBER integers keep integral lexical form
  }

  test("legacy BIFF multi-sheet workbook rejected with the reference message") {
    val path = tmp("legacy2.xls")
    graft.sources.BiffSource.writeXls(path, Seq(("A", grid), ("B", grid)))
    XlsxSource.readXlsx(spark, path) match {
      case Left(e: TableSource.SourceContentError) =>
        assert(e.message == "Your Excel file must contain only one worksheet for validation.")
      case other => fail(s"expected single-worksheet rejection, got $other")
    }
  }

  test("corrupt OLE2 payload (magic only, no workbook stream) → generic format-error") {
    val path = tmp("corrupt.xls")
    val ole2 = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte) ++
      Array.fill[Byte](512)(0)
    Files.write(java.nio.file.Paths.get(path), ole2)
    XlsxSource.readXlsx(spark, path) match {
      case Left(e: TableSource.FormatError) =>
        assert(e.message ==
          "Could not read your Excel file. Are you sure your specified format (xls) is correct?")
      case other => fail(s"expected format-error, got $other")
    }
  }

  test("BIFF SST strings split across CONTINUE records parse correctly (MS-XLS 2.5.293)") {
    // hand-craft a workbook whose SST splits a string at a CONTINUE
    // boundary, restarting the grbit flags byte — the trickiest corner of
    // the BIFF format and the one naive parsers get wrong
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def rec(id: Int, p: Array[Byte]) = le16(id) ++ le16(p.length) ++ p
    val bof = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ Array.fill[Byte](12)(0))
    val sheetBof = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ Array.fill[Byte](12)(0))
    val eof = rec(0x000a, Array.emptyByteArray)
    // SST: 2 strings; the second ("helloWORLD") splits after "hello":
    // first half compressed (flags 0), continuation restarts flags as wide
    val sstPayload = le32(2) ++ le32(2) ++
      (le16(2) ++ Array(0x00.toByte) ++ "ab".getBytes("ISO-8859-1")) ++
      (le16(10) ++ Array(0x00.toByte) ++ "hello".getBytes("ISO-8859-1"))
    val continuePayload = Array(0x01.toByte) ++ "WORLD".getBytes("UTF-16LE")
    // globals length: bof + boundsheet + sst + continue + eof
    val bsLen = 4 + 8 + 2 // header + fixed + 1-char wide name
    val globalsLen = bof.length + bsLen + (4 + sstPayload.length) + (4 + continuePayload.length) + eof.length
    val boundSheet = rec(0x0085, le32(globalsLen) ++ Array[Byte](0, 0) ++ Array(1.toByte, 1.toByte) ++ "S".getBytes("UTF-16LE"))
    val sheet = sheetBof ++
      rec(0x00fd, le16(0) ++ le16(0) ++ le16(0) ++ le32(1)) ++ // A1 = sst[1]
      rec(0x00fd, le16(1) ++ le16(0) ++ le16(0) ++ le32(0)) ++ // A2 = sst[0]
      eof
    val stream = bof ++ boundSheet ++ rec(0x00fc, sstPayload) ++ rec(0x003c, continuePayload) ++ eof ++ sheet
    val grid2 = graft.sources.BiffSource.parseWorkbook(stream)
    assert(grid2.size == 1)
    assert(grid2.head._2 == IndexedSeq(IndexedSeq("helloWORLD"), IndexedSeq("ab")))
  }

  test("BIFF cell records the fixture writer never emits: RK, MULRK, BOOLERR, LABEL, FORMULA+STRING") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def rec(id: Int, p: Array[Byte]) = le16(id) ++ le16(p.length) ++ p
    val bof = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ Array.fill[Byte](12)(0))
    val sheetBof = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ Array.fill[Byte](12)(0))
    val eof = rec(0x000a, Array.emptyByteArray)
    val sstPayload = le32(0) ++ le32(0) // empty SST
    val bsLen = 4 + 8 + 2
    val globalsLen = bof.length + bsLen + (4 + sstPayload.length) + eof.length
    val boundSheet = rec(0x0085, le32(globalsLen) ++ Array[Byte](0, 0) ++ Array(1.toByte, 1.toByte) ++ "S".getBytes("UTF-16LE"))
    def cellHdr(r: Int, c: Int) = le16(r) ++ le16(c) ++ le16(0)
    // RK encodings ([MS-XLS] 2.5.276): int -> v<<2|2, cents -> v<<2|3,
    // double -> top 30 bits of the IEEE bits
    val rkInt42 = (42 << 2) | 0x2
    val rkCents = (1234 << 2) | 0x3 // 12.34
    val rkDouble25 = 0x40040000 // 2.5's top 32 bits, low 2 already 0
    val labelStr = "plain label"
    val formulaStr = "fx result"
    val sheet = sheetBof ++
      rec(0x027e, cellHdr(0, 0) ++ le32(rkInt42)) ++ // A1 = 42
      rec(0x00bd, le16(1) ++ le16(0) ++ // MULRK row 1, cols 0-1: 12.34, 2.5
        le16(0) ++ le32(rkCents) ++ le16(0) ++ le32(rkDouble25) ++ le16(1)) ++
      rec(0x0205, cellHdr(2, 0) ++ Array[Byte](1, 0)) ++ // BOOLERR true
      rec(0x0205, cellHdr(2, 1) ++ Array[Byte](0x2a, 1)) ++ // BOOLERR error -> blank
      rec(0x0204, cellHdr(3, 0) ++ le16(labelStr.length) ++ Array(0x01.toByte) ++ labelStr.getBytes("UTF-16LE")) ++
      rec(0x0006, cellHdr(4, 0) ++ Array[Byte](0, 0, 0, 0, 0, 0, -1, -1)) ++ // FORMULA string result
      rec(0x0207, le16(formulaStr.length) ++ Array(0x01.toByte) ++ formulaStr.getBytes("UTF-16LE")) ++
      rec(0x0006, cellHdr(4, 1) ++ Array[Byte](1, 0, 1, 0, 0, 0, -1, -1)) ++ // FORMULA bool result true
      rec(0x0006, cellHdr(4, 2) ++ le16(0) ++ le16(0) ++ le32(0x40450000)) ++ // FORMULA numeric 42.0 (IEEE 0x4045000000000000 = 42.0)
      eof
    val stream = bof ++ boundSheet ++ rec(0x00fc, sstPayload) ++ eof ++ sheet
    val grids = graft.sources.BiffSource.parseWorkbook(stream)
    assert(grids.size == 1)
    val g = grids.head._2
    assert(g(0)(0) == "42") // RK int
    assert(g(1)(0) == "12.34" && g(1)(1) == "2.5") // MULRK cents + double
    assert(g(2)(0) == "true" && g(2)(1) == null) // BOOLERR value / error
    assert(g(3)(0) == "plain label") // LABEL inline string
    assert(g(4)(0) == "fx result") // FORMULA + STRING
    assert(g(4)(1) == "true") // FORMULA cached boolean
    assert(g(4)(2) == "42") // FORMULA cached numeric
  }

  test("CFB mini-stream layout (workbook < 4096 bytes in the mini-FAT) parses — the real-world small-file shape") {
    // writeXls always pads past the mini cutoff; REAL small .xls files from
    // Excel store the Workbook stream in 64-byte mini sectors chained by the
    // mini-FAT inside the root entry's stream. Hand-craft that layout.
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def rec(id: Int, p: Array[Byte]) = le16(id) ++ le16(p.length) ++ p
    val bof = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ Array.fill[Byte](12)(0))
    val sheetBof = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ Array.fill[Byte](12)(0))
    val eof = rec(0x000a, Array.emptyByteArray)
    val label = "mini stream cell"
    val sstPayload = le32(0) ++ le32(0)
    val bsLen = 4 + 8 + 2
    val globalsLen = bof.length + bsLen + (4 + sstPayload.length) + eof.length
    val boundSheet = rec(0x0085, le32(globalsLen) ++ Array[Byte](0, 0) ++ Array(1.toByte, 1.toByte) ++ "S".getBytes("UTF-16LE"))
    val sheet = sheetBof ++
      rec(0x0204, le16(0) ++ le16(0) ++ le16(0) ++ le16(label.length) ++ Array(0x01.toByte) ++ label.getBytes("UTF-16LE")) ++
      eof
    val wb = bof ++ boundSheet ++ rec(0x00fc, sstPayload) ++ eof ++ sheet
    assert(wb.length < 4096, "fixture must stay under the mini cutoff")

    // CFB: sector 0 = FAT, 1 = directory, 2 = miniFAT, 3.. = root mini-stream
    val miniSectors = (wb.length + 63) / 64
    val rootBytes = miniSectors * 64
    val rootSectors = (rootBytes + 511) / 512
    val End = 0xfffffffe
    val out = new java.io.ByteArrayOutputStream()
    // header
    out.write(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    out.write(new Array[Byte](16))
    out.write(le16(0x003e)); out.write(le16(0x0003)); out.write(le16(0xfffe))
    out.write(le16(9)); out.write(le16(6)); out.write(new Array[Byte](6))
    out.write(le32(0)); out.write(le32(1)) // numDirSectors(v3), numFat
    out.write(le32(1)); out.write(le32(0)) // dirStart, transaction
    out.write(le32(4096))
    out.write(le32(2)); out.write(le32(1)) // miniFAT start sector, count
    out.write(le32(End)); out.write(le32(0)) // DIFAT
    out.write(le32(0)); (1 until 109).foreach(_ => out.write(le32(0xffffffff)))
    // FAT sector
    val fat = new java.io.ByteArrayOutputStream()
    fat.write(le32(0xfffffffd)); fat.write(le32(End)); fat.write(le32(End)) // FAT, dir, miniFAT
    (0 until rootSectors).foreach(i => fat.write(le32(if (i == rootSectors - 1) End else 3 + i + 1)))
    (3 + rootSectors until 128).foreach(_ => fat.write(le32(0xffffffff)))
    out.write(fat.toByteArray)
    // directory: root (type 5, holds the mini stream), Workbook (type 2, mini sector 0)
    def dirEntry(name: String, typ: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val e = new java.io.ByteArrayOutputStream()
      val nm = name.getBytes("UTF-16LE")
      e.write(nm); e.write(new Array[Byte](64 - nm.length))
      e.write(le16(nm.length + 2)); e.write(typ); e.write(1)
      e.write(le32(-1)); e.write(le32(-1)); e.write(le32(child))
      e.write(new Array[Byte](16)); e.write(le32(0)); e.write(new Array[Byte](16))
      e.write(le32(start)); e.write(le32(size)); e.write(le32(0))
      e.toByteArray
    }
    out.write(dirEntry("Root Entry", 5, 1, 3, rootBytes))
    out.write(dirEntry("Workbook", 2, -1, 0, wb.length))
    out.write(new Array[Byte](128)); out.write(new Array[Byte](128))
    // miniFAT sector: chain mini sectors 0..miniSectors-1
    val mfat = new java.io.ByteArrayOutputStream()
    (0 until miniSectors).foreach(i => mfat.write(le32(if (i == miniSectors - 1) End else i + 1)))
    (miniSectors until 128).foreach(_ => mfat.write(le32(0xffffffff)))
    out.write(mfat.toByteArray)
    // root mini-stream data (wb in 64-byte sectors), sector-padded
    out.write(wb); out.write(new Array[Byte](rootBytes - wb.length))
    val tail = (512 - rootBytes % 512) % 512
    if (tail > 0) out.write(new Array[Byte](tail))

    val table = XlsxSource.readXlsxBytes(spark, out.toByteArray, "xls").fold(e => fail(e.message), identity)
    assert(table.headers == Seq(label)) // single cell → header row
  }

  test("property: arbitrary grids round-trip through writeXls → BIFF8 parse") {
    // BIFF stores numbers as IEEE doubles, so numeric cells must use
    // canonical lexical forms (no trailing zeros) to round-trip exactly
    def randomCell(r: scala.util.Random): String = r.nextInt(6) match {
      case 0 => null
      case 1 => r.nextInt(2000).toString
      case 2 => (r.nextInt(4000) - 2000).toString
      case 3 => "" // empty string → SST
      case 4 => s"${r.nextInt(100)}.${1 + r.nextInt(8)}" // no trailing zero
      case _ => (0 to r.nextInt(12)).map(_ => "αβ<&\"'x yé中"(r.nextInt(11))).mkString
    }
    for (seed <- 1 to 5) {
      val r = new scala.util.Random(seed)
      val rows = 1 + r.nextInt(8)
      val cols = 1 + r.nextInt(5)
      val header = (0 until cols).map(i => s"h$i")
      // pin the last row's first cell: a trailing all-null row has no cell
      // records in BIFF, so the parser (like xlrd) cannot know it exists
      val grid = header +: (0 until rows).map(ri =>
        (0 until cols).map(ci => if (ri == rows - 1 && ci == 0) "end" else randomCell(r)))
      val path = tmp(s"prop_biff_$seed.xls")
      graft.sources.BiffSource.writeXls(path, Seq(("S", grid.map(_.toSeq))))
      val table = XlsxSource.readXlsx(spark, path).fold(e => fail(e.message), identity)
      val got = table.df.orderBy("_row_number").collect()
        .map(row => (0 until cols).map(i => row.getString(i)))
      val expected = grid.drop(1)
      assert(got.map(_.toList).toList == expected.map(_.toList).toList, s"seed=$seed")
    }
  }

  test("shared-string cell with no <v> payload is a BLANK cell, not a broken workbook") {
    // some producers emit <c t="s"/> for blank cells; "".toInt used to throw
    // and the outer catch converted the WHOLE workbook into a format error
    def zip(entries: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (name, content) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      zos.close()
      bos.toByteArray
    }
    val bytes = zip(
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S" sheetId="1"/></sheets></workbook>""",
      "xl/sharedStrings.xml" ->
        """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2"><si><t>ha</t></si><si><t>hb</t></si></sst>""",
      "xl/worksheets/sheet1.xml" ->
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2" t="s"/><c r="B2" t="s"><v>0</v></c></row>
          |</sheetData></worksheet>""".stripMargin
    )
    val table = XlsxSource.readXlsxBytes(spark, bytes).fold(e => fail(e.message), identity)
    assert(table.headers == Seq("ha", "hb"))
    val r = table.df.orderBy("_row_number").collect()(0)
    assert(r.getString(0) == null, "empty shared-string cell must read as blank")
    assert(r.getString(1) == "ha")
  }
}
