package graft.sources

import java.io.ByteArrayOutputStream

import scala.collection.mutable

import graft.sources.TableSource.{FormatError, SourceContentError, SourceError}

/** Legacy Excel (.xls / BIFF8) reader — the reference reads these through
  * `pandas.ExcelFile`/xlrd (`jobs.py:272-294`, `settings.py:6` lists `xls`),
  * with the same single-worksheet invariant and format-error taxonomy as the
  * OOXML path. This is a from-scratch minimal parser of the two public
  * binary specs on the JDK alone: [MS-CFB] (OLE2 compound file: FAT sector
  * chains, directory entries, mini-stream) and [MS-XLS] (BIFF8 record
  * stream: SST with CONTINUE splits, BOUNDSHEET-addressed sheet substreams,
  * LABELSST/NUMBER/RK/MULRK/BOOLERR/LABEL/FORMULA+STRING cell records).
  *
  * Output contract matches `XlsxSource.parseGrid`: a dense all-string cell
  * grid, numbers in minimal lexical form ("42", "42.5"), booleans
  * "true"/"false", blanks null — so `.xls` and `.xlsx` flow through the
  * identical downstream validation plan.
  *
  * The writer half emits a minimal valid BIFF8 workbook inside a
  * single-stream CFB container (globals + SST + one sheet substream per
  * grid) for round-trip tests and fixtures — the `XlsxSource.writeXlsx`
  * role for the legacy format.
  */
object BiffSource {

  // ---------------------------------------------------------------
  // [MS-CFB] minimal compound-file reader
  // ---------------------------------------------------------------

  private def leShort(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private final val EndOfChain = 0xfffffffe
  private final val FreeSect = 0xffffffff

  /** Stream name → bytes for every stream entry in the compound file. */
  private[graft] def cfbStreams(b: Array[Byte]): Map[String, Array[Byte]] = {
    require(b.length >= 512, "cfb too short")
    require(leInt(b, 0) == 0xe011cfd0 && leInt(b, 4) == 0xe11ab1a1, "not an OLE2 compound file")
    val sectorSize = 1 << leShort(b, 30)
    val miniSize = 1 << leShort(b, 32)
    val dirStart = leInt(b, 48)
    val miniCutoff = leInt(b, 56)
    val miniFatStart = leInt(b, 60)
    val difatStart = leInt(b, 68)
    val numDifat = leInt(b, 72)

    def sector(i: Int): Array[Byte] = {
      // [MS-CFB] 2.2: sector 0 starts AFTER one sector-sized header region,
      // so the offset is (i+1)*sectorSize — identical to 512 + i*512 for the
      // common v3 (512 B) files, and correct for v4 (4096 B sector) files,
      // whose header is padded to 4096.
      val off = (i.toLong + 1) * sectorSize
      require(off + sectorSize <= b.length, s"sector $i out of range")
      b.slice(off.toInt, off.toInt + sectorSize)
    }

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    (0 until 109).foreach { i =>
      val s = leInt(b, 76 + 4 * i)
      if (s != FreeSect && s != EndOfChain) fatSectors += s
    }
    var difat = difatStart
    var difatCount = 0
    while (difat != EndOfChain && difat != FreeSect && difatCount < numDifat + 1) {
      val ds = sector(difat)
      (0 until sectorSize / 4 - 1).foreach { i =>
        val s = leInt(ds, 4 * i)
        if (s != FreeSect && s != EndOfChain) fatSectors += s
      }
      difat = leInt(ds, sectorSize - 4)
      difatCount += 1
    }
    val entriesPerFat = sectorSize / 4
    def fatEntry(i: Int): Int = {
      val fs = fatSectors(i / entriesPerFat)
      leInt(sector(fs), 4 * (i % entriesPerFat))
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && out.size < size && guard < b.length / 64 + 16) {
        out.write(sector(s))
        s = fatEntry(s)
        guard += 1
      }
      out.toByteArray.take(math.min(size, out.size.toLong).toInt)
    }

    // directory entries (128 bytes each) from the directory chain
    val dirBytes = readChain(dirStart, Long.MaxValue >> 1)
    final case class Dir(name: String, typ: Int, start: Int, size: Long)
    val dirs = (0 until dirBytes.length / 128).map { i =>
      val o = i * 128
      val nameLen = leShort(dirBytes, o + 64)
      val name =
        if (nameLen >= 2) new String(dirBytes.slice(o, o + nameLen - 2), "UTF-16LE") else ""
      Dir(name, dirBytes(o + 66) & 0xff, leInt(dirBytes, o + 116), leInt(dirBytes, o + 120) & 0xffffffffL)
    }
    val root = dirs.find(_.typ == 5).getOrElse(throw new IllegalArgumentException("cfb has no root entry"))

    // mini stream: the root entry's regular chain, addressed in 64-byte units
    lazy val miniStream = readChain(root.start, root.size)
    lazy val miniFat = readChain(miniFatStart, Long.MaxValue >> 1)
    def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && out.size < size && guard < miniStream.length / 16 + 16) {
        out.write(miniStream, s * miniSize, math.min(miniSize, miniStream.length - s * miniSize))
        s = leInt(miniFat, 4 * s)
        guard += 1
      }
      out.toByteArray.take(math.min(size, out.size.toLong).toInt)
    }

    dirs.filter(_.typ == 2).map { d =>
      d.name -> (if (d.size < miniCutoff) readMiniChain(d.start, d.size) else readChain(d.start, d.size))
    }.toMap
  }

  // ---------------------------------------------------------------
  // BIFF8 record stream
  // ---------------------------------------------------------------

  private final val RecBof = 0x0809
  private final val RecEof = 0x000a
  private final val RecBoundSheet = 0x0085
  private final val RecSst = 0x00fc
  private final val RecContinue = 0x003c
  private final val RecLabelSst = 0x00fd
  private final val RecNumber = 0x0203
  private final val RecRk = 0x027e
  private final val RecMulRk = 0x00bd
  private final val RecBoolErr = 0x0205
  private final val RecLabel = 0x0204
  private final val RecFormula = 0x0006
  private final val RecString = 0x0207

  /** Parse a BIFF8 workbook stream into per-sheet dense grids (sheet name →
    * grid). Throws on malformed input; callers map to format-error. */
  private[graft] def parseWorkbook(s: Array[Byte]): IndexedSeq[(String, IndexedSeq[IndexedSeq[String]])] = {
    require(s.length >= 4 && leShort(s, 0) == RecBof, "not a BIFF stream")
    // pass 1: workbook globals — BOUNDSHEETs + SST
    var pos = 0
    val sheets = mutable.ArrayBuffer.empty[(Int, String)] // (lbPlyPos, name)
    var sst = IndexedSeq.empty[String]
    var depth = 0
    var done = false
    while (!done && pos + 4 <= s.length) {
      val id = leShort(s, pos)
      val len = leShort(s, pos + 2)
      val data = s.slice(pos + 4, pos + 4 + len)
      id match {
        case RecBof => depth += 1
        case RecEof => depth -= 1; if (depth <= 0) done = true
        case RecBoundSheet if depth == 1 =>
          val lbPlyPos = leInt(data, 0)
          val hidden = data(4) & 0x03
          val typ = data(5) & 0xff
          val nameLen = data(6) & 0xff
          val wide = (data(7) & 0x01) != 0
          val name =
            if (wide) new String(data.slice(8, 8 + 2 * nameLen), "UTF-16LE")
            else new String(data.slice(8, 8 + nameLen), "ISO-8859-1")
          // worksheet type 0x00 only (chart=0x02, macro=0x01); hidden still counts
          if (typ == 0x00) { val _ = hidden; sheets += ((lbPlyPos, name)) }
        case RecSst if depth == 1 =>
          sst = parseSst(s, pos)
        case _ =>
      }
      pos += 4 + len
    }
    sheets.map { case (at, name) => name -> parseSheet(s, at, sst) }.toIndexedSeq
  }

  /** SST with CONTINUE handling: a cursor over the record's payload that
    * transparently crosses into CONTINUE records; each continuation boundary
    * that lands inside a string's character data restarts the grbit flags
    * byte ([MS-XLS] 2.5.293 XLUnicodeRichExtendedString). */
  private def parseSst(s: Array[Byte], recPos: Int): IndexedSeq[String] = {
    // collect the payload segments (SST + following CONTINUEs)
    val segs = mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = recPos
    var first = true
    while (pos + 4 <= s.length && (first || leShort(s, pos) == RecContinue)) {
      val len = leShort(s, pos + 2)
      segs += s.slice(pos + 4, pos + 4 + len)
      first = false
      pos += 4 + len
    }
    var seg = 0
    var off = 8 // skip cstTotal + cstUnique of segment 0
    val cstUnique = leInt(segs(0), 4)
    def atEnd: Boolean = seg >= segs.length || (seg == segs.length - 1 && off >= segs(seg).length)
    def advance(): Unit = { while (seg < segs.length && off >= segs(seg).length) { seg += 1; off = 0 } }
    def u8(): Int = { advance(); val v = segs(seg)(off) & 0xff; off += 1; v }
    def u16(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
    def u32(): Long = { val a = u16().toLong; val b = u16().toLong; a | (b << 16) }
    def skip(n: Long): Unit = { var left = n; while (left > 0) { advance(); val take = math.min(left, (segs(seg).length - off).toLong).toInt; off += take; left -= take } }

    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < cstUnique && !atEnd) {
      val cch = u16()
      var flags = u8()
      val cRun = if ((flags & 0x08) != 0) u16() else 0
      val cbExt = if ((flags & 0x04) != 0) u32() else 0L
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      // [MS-XLS] 2.5.293: character data resuming in a NEW Continue segment
      // starts with a fresh grbit byte — including when the continuation
      // boundary falls immediately after the cch/flags header (read == 0),
      // so track the segment the current grbit was read in rather than
      // gating on read > 0.
      var grbitSeg = seg
      while (read < cch) {
        advance()
        if (off == 0 && seg != grbitSeg) { flags = u8(); grbitSeg = seg } // continuation boundary: fresh grbit
        val wide = (flags & 0x01) != 0
        val avail = segs(seg).length - off
        val charBytes = if (wide) 2 else 1
        val take = math.min(cch - read, avail / charBytes)
        if (take <= 0) { // not even one char available in this segment
          seg += 1; off = 0
          if (seg >= segs.length) read = cch // truncated; bail
        } else {
          val bs = segs(seg).slice(off, off + take * charBytes)
          sb.append(new String(bs, if (wide) "UTF-16LE" else "ISO-8859-1"))
          off += take * charBytes
          read += take
        }
      }
      skip(4L * cRun + cbExt)
      out += sb.toString
      i += 1
    }
    out.result()
  }

  /** One sheet substream (from its BOF) → dense grid. */
  private def parseSheet(s: Array[Byte], bofPos: Int, sst: IndexedSeq[String]): IndexedSeq[IndexedSeq[String]] = {
    require(bofPos + 4 <= s.length && leShort(s, bofPos) == RecBof, "bad sheet offset")
    val cells = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(r: Int, c: Int, v: String): Unit = {
      if (v != null) { cells((r, c)) = v; if (r > maxRow) maxRow = r; if (c > maxCol) maxCol = c }
    }
    def numStr(d: Double): String =
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
    def rkValue(rk: Int): Double = {
      val cents = (rk & 0x01) != 0
      val asInt = (rk & 0x02) != 0
      val v = if (asInt) (rk >> 2).toDouble else java.lang.Double.longBitsToDouble((rk.toLong & 0xfffffffcL) << 32)
      if (cents) v / 100.0 else v
    }
    def xlString(data: Array[Byte], o: Int): String = {
      val cch = leShort(data, o)
      val wide = (data(o + 2) & 0x01) != 0
      if (wide) new String(data.slice(o + 3, o + 3 + 2 * cch), "UTF-16LE")
      else new String(data.slice(o + 3, o + 3 + cch), "ISO-8859-1")
    }

    var pos = bofPos
    var depth = 0
    var done = false
    var pendingFormulaCell: Option[(Int, Int)] = None // string-result FORMULA awaits its STRING record
    while (!done && pos + 4 <= s.length) {
      val id = leShort(s, pos)
      val len = leShort(s, pos + 2)
      val data = s.slice(pos + 4, pos + 4 + len)
      id match {
        case RecBof => depth += 1
        case RecEof => depth -= 1; if (depth <= 0) done = true
        case RecLabelSst =>
          put(leShort(data, 0), leShort(data, 2), sst.lift(leInt(data, 6)).orNull)
        case RecNumber =>
          val bits = (0 until 8).map(i => (data(6 + i) & 0xffL) << (8 * i)).reduce(_ | _)
          put(leShort(data, 0), leShort(data, 2), numStr(java.lang.Double.longBitsToDouble(bits)))
        case RecRk =>
          put(leShort(data, 0), leShort(data, 2), numStr(rkValue(leInt(data, 6))))
        case RecMulRk =>
          val row = leShort(data, 0)
          val colFirst = leShort(data, 2)
          val n = (len - 6) / 6
          (0 until n).foreach { i =>
            put(row, colFirst + i, numStr(rkValue(leInt(data, 4 + 6 * i + 2))))
          }
        case RecBoolErr =>
          val isErr = (data(7) & 0xff) != 0
          if (!isErr) put(leShort(data, 0), leShort(data, 2), if (data(6) != 0) "true" else "false")
        case RecLabel =>
          put(leShort(data, 0), leShort(data, 2), xlString(data, 6))
        case RecFormula =>
          val row = leShort(data, 0); val c = leShort(data, 2)
          // cached result: 8 bytes at offset 6; 0xFFFF in the last two bytes
          // marks a non-numeric result whose tag is byte 0
          if ((data(12) & 0xff) == 0xff && (data(13) & 0xff) == 0xff) {
            (data(6) & 0xff) match {
              case 0 => pendingFormulaCell = Some((row, c)) // string: value in next STRING record
              case 1 => put(row, c, if (data(8) != 0) "true" else "false")
              case _ => // error / blank result → null cell
            }
          } else {
            val bits = (0 until 8).map(i => (data(6 + i) & 0xffL) << (8 * i)).reduce(_ | _)
            put(row, c, numStr(java.lang.Double.longBitsToDouble(bits)))
          }
        case RecString =>
          pendingFormulaCell.foreach { case (r, c) => put(r, c, xlString(data, 0)) }
          pendingFormulaCell = None
        case _ =>
      }
      pos += 4 + len
    }
    (0 to maxRow).map(r => (0 to maxCol).map(c => cells.getOrElse((r, c), null: String)))
  }

  /** The XlsxSource.parseGrid contract for BIFF payloads: single-worksheet
    * invariant and the reference's error strings (`jobs.py:278-292`). */
  private[graft] def parseGrid(bytes: Array[Byte], extension: String): Either[SourceError, IndexedSeq[IndexedSeq[String]]] = {
    val formatErr = FormatError(
      s"Could not read your Excel file. Are you sure your specified format ($extension) is correct?"
    )
    try {
      val streams = cfbStreams(bytes)
      val wb = streams.get("Workbook").orElse(streams.get("Book")).getOrElse(return Left(formatErr))
      val sheets = parseWorkbook(wb)
      if (sheets.size != 1)
        Left(SourceContentError("Your Excel file must contain only one worksheet for validation."))
      else Right(sheets.head._2)
    } catch { case _: Exception => Left(formatErr) }
  }

  // ---------------------------------------------------------------
  // Writer: minimal BIFF8 workbook in a single-stream CFB container
  // ---------------------------------------------------------------

  /** Write sheets of string grids as a legacy .xls. Numeric-looking cells
    * become NUMBER records; text goes through the SST (LABELSST); null cells
    * are omitted. The workbook stream is zero-padded past the 4096-byte
    * mini-stream cutoff so a single regular FAT chain carries it. */
  def writeXls(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val numeric = "^-?\\d+(\\.\\d+)?$".r
    // SST: collect unique strings
    val sst = mutable.LinkedHashMap.empty[String, Int]
    var totalStrings = 0
    sheets.foreach { case (_, grid) =>
      grid.foreach(_.foreach { cell =>
        if (cell != null && numeric.findFirstIn(cell).isEmpty) {
          totalStrings += 1
          sst.getOrElseUpdate(cell, sst.size)
        }
      })
    }

    def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
      require(payload.length <= 8224, "record too long for a fixture writer (no CONTINUE support)")
      val out = new Array[Byte](4 + payload.length)
      out(0) = (id & 0xff).toByte; out(1) = ((id >> 8) & 0xff).toByte
      out(2) = (payload.length & 0xff).toByte; out(3) = ((payload.length >> 8) & 0xff).toByte
      System.arraycopy(payload, 0, out, 4, payload.length)
      out
    }
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def le64(v: Long): Array[Byte] = (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

    def bof(typ: Int): Array[Byte] =
      rec(RecBof, le16(0x0600) ++ le16(typ) ++ le16(0x0dbb) ++ le16(0x07cc) ++ le32(0) ++ le32(0x0106))
    val eof = rec(RecEof, Array.emptyByteArray)

    // sheet substreams first (sizes feed BOUNDSHEET lbPlyPos)
    val sheetStreams = sheets.map { case (_, grid) =>
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0010))
      grid.zipWithIndex.foreach { case (cells, r) =>
        cells.zipWithIndex.foreach { case (cell, c) =>
          if (cell != null) {
            cell match {
              case numeric(_*) =>
                out.write(rec(RecNumber, le16(r) ++ le16(c) ++ le16(0) ++ le64(
                  java.lang.Double.doubleToLongBits(cell.toDouble))))
              case s =>
                out.write(rec(RecLabelSst, le16(r) ++ le16(c) ++ le16(0) ++ le32(sst(s))))
            }
          }
        }
      }
      out.write(eof)
      out.toByteArray
    }

    // globals: BOF + BOUNDSHEETs + SST + EOF; BOUNDSHEET size is fixed
    // per-sheet so lbPlyPos is computable before serialization
    def boundSheetLen(name: String): Int = 4 + 8 + 2 * name.length // header + fixed + utf16 name
    val sstPayload = {
      val out = new ByteArrayOutputStream()
      out.write(le32(totalStrings)); out.write(le32(sst.size))
      sst.keysIterator.foreach { s =>
        out.write(le16(s.length)); out.write(0x01) // always wide
        out.write(s.getBytes("UTF-16LE"))
      }
      out.toByteArray
    }
    val globalsLen = bof(0x0005).length +
      sheets.map { case (n, _) => boundSheetLen(n) }.sum +
      (4 + sstPayload.length) + eof.length
    val globals = new ByteArrayOutputStream()
    globals.write(bof(0x0005))
    var sheetPos = globalsLen
    sheets.zip(sheetStreams).foreach { case ((name, _), stream) =>
      globals.write(rec(RecBoundSheet,
        le32(sheetPos) ++ Array[Byte](0, 0) ++ Array((name.length & 0xff).toByte, 0x01.toByte) ++
          name.getBytes("UTF-16LE")))
      sheetPos += stream.length
    }
    globals.write(rec(RecSst, sstPayload))
    globals.write(eof)
    val stream = globals.toByteArray ++ sheetStreams.flatten

    writeCfb(path, "Workbook", stream)
  }

  /** Minimal [MS-CFB] container: one stream, regular FAT only (payload is
    * padded past the 4096 mini cutoff), single FAT sector — caps the stream
    * at 126 sectors (~63 KB), plenty for fixtures. */
  private def writeCfb(path: String, streamName: String, payload: Array[Byte]): Unit = {
    val padded = if (payload.length < 4096) payload ++ new Array[Byte](4096 - payload.length) else payload
    val dataSectors = (padded.length + 511) / 512
    require(dataSectors + 2 <= 128, "fixture CFB writer caps at one FAT sector (~63 KB stream)")
    val le16 = (v: Int) => Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val le32 = (v: Int) => Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)

    val header = new ByteArrayOutputStream()
    header.write(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)) // magic
    header.write(new Array[Byte](16)) // clsid
    header.write(le16(0x003e)); header.write(le16(0x0003)) // minor/major
    header.write(le16(0xfffe)) // byte order
    header.write(le16(9)); header.write(le16(6)) // sector/mini shifts
    header.write(new Array[Byte](6)) // reserved
    header.write(le32(0)) // num dir sectors (v3: 0)
    header.write(le32(1)) // num FAT sectors
    header.write(le32(1)) // first directory sector
    header.write(le32(0)) // transaction
    header.write(le32(4096)) // mini cutoff
    header.write(le32(EndOfChain)); header.write(le32(0)) // miniFAT start/count
    header.write(le32(EndOfChain)); header.write(le32(0)) // DIFAT start/count
    header.write(le32(0)) // DIFAT[0] = FAT sector 0
    (1 until 109).foreach(_ => header.write(le32(FreeSect)))

    // FAT: sector 0 = FAT itself, 1 = directory, 2.. = stream chain
    val fat = new ByteArrayOutputStream()
    fat.write(le32(0xfffffffd)) // FAT sector marker
    fat.write(le32(EndOfChain)) // directory (one sector)
    (0 until dataSectors).foreach { i =>
      fat.write(le32(if (i == dataSectors - 1) EndOfChain else 2 + i + 1))
    }
    (2 + dataSectors until 128).foreach(_ => fat.write(le32(FreeSect)))

    def dirEntry(name: String, typ: Int, color: Int, left: Int, right: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val nm = name.getBytes("UTF-16LE")
      out.write(nm); out.write(new Array[Byte](64 - nm.length))
      out.write(le16(nm.length + 2))
      out.write(typ); out.write(color)
      out.write(le32(left)); out.write(le32(right)); out.write(le32(child))
      out.write(new Array[Byte](16)) // clsid
      out.write(le32(0)) // state
      out.write(new Array[Byte](16)) // timestamps
      out.write(le32(start)); out.write(le32(size)); out.write(le32(0))
      out.toByteArray
    }
    val dir = new ByteArrayOutputStream()
    dir.write(dirEntry("Root Entry", 5, 1, -1, -1, 1, EndOfChain, 0))
    dir.write(dirEntry(streamName, 2, 1, -1, -1, -1, 2, padded.length))
    val empty = new Array[Byte](128); empty(66) = 0 // unused entry, type 0
    dir.write(empty); dir.write(empty)

    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val fos = new java.io.FileOutputStream(f)
    try {
      fos.write(header.toByteArray)
      fos.write(fat.toByteArray)
      fos.write(dir.toByteArray)
      fos.write(padded)
      val tail = (512 - padded.length % 512) % 512
      if (tail > 0) fos.write(new Array[Byte](tail))
    } finally fos.close()
  }
}
