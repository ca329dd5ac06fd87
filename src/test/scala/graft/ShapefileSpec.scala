package graft

import java.nio.file.Files

import graft.runner.ValidationRunner
import graft.schema._
import graft.sources.{ShapefileSource, TableSource}

/** Zipped-shapefile reader: reference semantics from jobs.py:335-387 —
  * DBF attribute table read header-less (field names are data row 1),
  * synthesized adr_geometry_check geometry-presence column, exactly-one-.shp
  * invariant, reference failure messages — plus writer round-trips with
  * planted null shapes feeding the missing-geometry check. */
class ShapefileSpec extends SparkSpec {

  private def fc = FieldConstraints()

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_shp").resolve(name).toString

  private val fields = Seq("id", "name", "region")
  private val records: Seq[Seq[String]] = Seq(
    Seq("1", "alpha", "2"),
    Seq("2", "beta", "4"),
    Seq("3", "gamma longer than eight", "1"),
    Seq("4", null, "3")
  )

  test("round trip: DBF attribute table + adr_geometry_check header injection") {
    val path = tmp("t.shp")
    ShapefileSource.writeShapefile(path, fields, records)
    val table = ShapefileSource.readShapefile(spark, path).fold(e => fail(e.message), identity)
    assert(table.headers == Seq("id", "name", "region", "adr_geometry_check"))
    val rows = table.df.orderBy("_row_number").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(4)).toSeq == Seq(2L, 3L, 4L, 5L)) // header is row 1
    assert(rows(0).getString(1) == "alpha")
    assert(rows(2).getString(1) == "gamma longer than eight")
    assert(rows(3).getString(1) == "") // null cell → space-padded DBF → ""
    assert(rows.map(_.getString(3)).toSeq == Seq.fill(4)("True")) // all point shapes
  }

  test("planted null shapes surface as adr_geometry_check=False at the right rows") {
    val path = tmp("nulls.shp")
    ShapefileSource.writeShapefile(path, fields, records, nullShapeAt = i => i % 2 == 1)
    val table = ShapefileSource.readShapefile(spark, path).fold(e => fail(e.message), identity)
    val geo = table.df.orderBy("_row_number").collect().map(_.getString(3)).toSeq
    assert(geo == Seq("True", "False", "True", "False"))
  }

  test("zip without exactly one .shp rejected with the reference message (jobs.py:351-355)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt")); zos.write("hi".getBytes); zos.closeEntry()
    zos.close()
    ShapefileSource.readShapefileBytes(spark, bos.toByteArray) match {
      case Left(e: TableSource.SourceContentError) =>
        assert(e.message == "Zipped archive must contain exactly one .shp file.")
      case other => fail(s"expected exactly-one-shp rejection, got $other")
    }
  }

  test("garbage payload → unzip failure with the reference message (jobs.py:345-349)") {
    ShapefileSource.readShapefileBytes(spark, "this is not a zip".getBytes) match {
      case Left(e: TableSource.FormatError) =>
        assert(e.message.startsWith("Could not unzip file: "))
      case other => fail(s"expected unzip format-error, got $other")
    }
  }

  test("zip with .shp but corrupt/missing siblings → 'Not a valid shp file' (jobs.py:383-387)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("x.shp")); zos.write(Array[Byte](1, 2, 3)); zos.closeEntry()
    zos.close()
    ShapefileSource.readShapefileBytes(spark, bos.toByteArray) match {
      case Left(e: TableSource.FormatError) =>
        assert(e.message.startsWith("Not a valid shp file: "))
      case other => fail(s"expected not-a-valid-shp error, got $other")
    }
  }

  test("zip missing only the .shx index → 'Not a valid shp file' (jobs.py:360 opens base+'.shx')") {
    // a fully valid .shp/.dbf pair whose .shx was dropped must fail the same
    // way the reference does, not validate successfully
    val path = tmp("noshx.shp")
    ShapefileSource.writeShapefile(path, fields, records)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { e =>
      val b = zin.readAllBytes()
      if (!e.getName.endsWith(".shx")) {
        zos.putNextEntry(new java.util.zip.ZipEntry(e.getName)); zos.write(b); zos.closeEntry()
      }
    }
    zos.close()
    ShapefileSource.readShapefileBytes(spark, bos.toByteArray) match {
      case Left(e: TableSource.FormatError) =>
        assert(e.message.startsWith("Not a valid shp file: ") && e.message.contains(".shx"))
      case other => fail(s"expected not-a-valid-shp error for missing .shx, got $other")
    }
  }

  test("dispatch: shp routes to the shapefile reader") {
    assert(TableSource.formatOf("data.shp") == Right("shapefile"))
  }

  test("runShapefile end-to-end: schema violations + missing-geometry (same pipeline as CSV)") {
    val path = tmp("val.shp")
    ShapefileSource.writeShapefile(path, fields, records, nullShapeAt = i => i == 2)
    val schema = TableSchema(Seq(
      Field("id", ftype = "integer"),
      Field("name", constraints = fc.copy(maxLength = Some(8))),
      Field("region", ftype = "integer", constraints = fc.copy(maximum = Some(3.0))),
      Field("adr_geometry_check")
    ))
    val (report, status) = ValidationRunner.runShapefile(spark, path, schema)
    assert(status == "failure")
    val errs = report.tables.head.errors
    assert(errs.map(v => (v.code, v.rowNumber.get)).toSet == Set(
      ("maximum-constraint", 3L),         // region 4 > 3
      ("maximum-length-constraint", 4L),  // long name
      ("missing-geometry", 4L)            // planted null shape at record 2 → row 4
    ))
    assert(report.tables.head.rowCount == 5) // header + 4 data rows
  }

  test("runShapefile on an unreadable payload → zero-table ERROR report") {
    val path = tmp("bad.shp")
    Files.write(java.nio.file.Paths.get(path), Array[Byte](9, 9, 9))
    val (report, status) = ValidationRunner.runShapefile(spark, path, TableSchema(Seq(Field("a"))))
    assert(status == "error")
    assert(report.tables.isEmpty)
  }

  test("property: arbitrary grids round-trip through writeShapefile → parse") {
    def randomCell(r: scala.util.Random): String = r.nextInt(5) match {
      case 0 => null // space-padded → reads back ""
      case 1 => r.nextInt(2000).toString
      case 2 => "" // empty
      case 3 => (0 to r.nextInt(12)).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      case _ => "x y" + r.nextInt(100) // inner spaces survive the trim (only edges trimmed)
    }
    for (seed <- 1 to 5) {
      val r = new scala.util.Random(seed)
      val rows = 1 + r.nextInt(8)
      val cols = 1 + r.nextInt(5)
      val flds = (0 until cols).map(i => s"f$i")
      val recs = (0 until rows).map(_ => (0 until cols).map(_ => randomCell(r)))
      val nulls = (0 until rows).map(_ => r.nextBoolean())
      val path = tmp(s"prop_$seed.shp")
      ShapefileSource.writeShapefile(path, flds, recs.map(_.toSeq), nullShapeAt = nulls(_))
      val table = ShapefileSource.readShapefile(spark, path).fold(e => fail(e.message), identity)
      val got = table.df.orderBy("_row_number").collect()
      assert(got.length == rows, s"seed=$seed")
      got.zipWithIndex.foreach { case (row, i) =>
        (0 until cols).foreach { c =>
          val exp = Option(recs(i)(c)).getOrElse("")
          assert(row.getString(c) == exp, s"seed=$seed row=$i col=$c")
        }
        assert(row.getString(cols) == (if (nulls(i)) "False" else "True"), s"seed=$seed row=$i geom")
      }
    }
  }

  test("typed DBF fields (N/F/L/D) render pyshp's lexical surface; polyline shapes carry geometry") {
    // the fixture writer emits only C fields and point shapes — hand-craft a
    // DBF with numeric/logical/date fields and a SHP with polyline records
    // to pin the reader's typed-value and numPoints paths
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def be32(v: Int) = Array(v >> 24, v >> 16, v >> 8, v).map(x => (x & 0xff).toByte)
    def fieldDesc(name: String, typ: Char, len: Int): Array[Byte] = {
      val nm = name.getBytes("ISO-8859-1").take(10)
      nm ++ new Array[Byte](11 - nm.length) ++ Array(typ.toByte) ++ new Array[Byte](4) ++
        Array(len.toByte, 0.toByte) ++ new Array[Byte](14)
    }
    val fields = Seq(("num", 'N', 8), ("flt", 'F', 8), ("flag", 'L', 1), ("day", 'D', 8))
    val recordLen = 1 + fields.map(_._3).sum
    val headerLen = 32 + fields.size * 32 + 1
    // cells at exact field widths (numerics right-justified, as dBASE writes)
    val recs = Seq(
      Seq("      42", "        ", "T", "20240102"),
      Seq("   -7.50", "    1.25", "F", "        ")
    )
    val dbf = new java.io.ByteArrayOutputStream()
    dbf.write(3); dbf.write(Array[Byte](95, 1, 1))
    dbf.write(le32(recs.size)); dbf.write(le16(headerLen)); dbf.write(le16(recordLen))
    dbf.write(new Array[Byte](20))
    fields.foreach { case (n, t, l) => dbf.write(fieldDesc(n, t, l)) }
    dbf.write(0x0d)
    recs.foreach { r =>
      dbf.write(0x20)
      fields.zip(r).foreach { case ((_, _, len), v) =>
        val bs = v.getBytes("ISO-8859-1").take(len)
        dbf.write(bs); dbf.write(Array.fill[Byte](len - bs.length)(' '))
      }
    }
    dbf.write(0x1a)
    // SHP: header + one polyline with 2 points + one polyline with 0 points
    def polyline(numPoints: Int): Array[Byte] = {
      val content = le32(3) ++ new Array[Byte](32) ++ le32(1) ++ le32(numPoints) ++
        le32(0) ++ new Array[Byte](16 * numPoints)
      content
    }
    val shp = new java.io.ByteArrayOutputStream()
    shp.write(be32(9994)); (1 to 5).foreach(_ => shp.write(be32(0)))
    val c1 = polyline(2); val c2 = polyline(0)
    shp.write(be32(50 + (8 + c1.length + 8 + c2.length) / 2))
    shp.write(le32(1000)); shp.write(le32(3)); shp.write(new Array[Byte](64))
    shp.write(be32(1)); shp.write(be32(c1.length / 2)); shp.write(c1)
    shp.write(be32(2)); shp.write(be32(c2.length / 2)); shp.write(c2)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("t.shp")); zos.write(shp.toByteArray); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("t.dbf")); zos.write(dbf.toByteArray); zos.closeEntry()
    // required sibling (reference jobs.py:360); content never parsed
    zos.putNextEntry(new java.util.zip.ZipEntry("t.shx")); zos.write(new Array[Byte](100)); zos.closeEntry()
    zos.close()
    val table = ShapefileSource.readShapefileBytes(spark, bos.toByteArray).fold(e => fail(e.message), identity)
    val rows = table.df.orderBy("_row_number").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "42") // N trimmed
    assert(rows(0).getString(1) == null) // empty numeric → null
    assert(rows(0).getString(2) == "True") // L
    assert(rows(0).getString(3) == "2024-01-02") // D → ISO
    assert(rows(1).getString(0) == "-7.50" && rows(1).getString(1) == "1.25")
    assert(rows(1).getString(2) == "False")
    assert(rows(1).getString(3) == null) // blank date
    // polyline with points → True; zero-point polyline → False
    assert(rows(0).getString(4) == "True" && rows(1).getString(4) == "False")
  }

  test("deleted DBF records (0x2A flag) are skipped like pyshp") {
    val path = tmp("del.shp")
    ShapefileSource.writeShapefile(path, Seq("id"), Seq(Seq("1"), Seq("2"), Seq("3")))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    // rewrite the zip, flagging the 2nd DBF record deleted
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val entries = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
      (e.getName, Iterator.continually(zin.read()).takeWhile(_ >= 0).map(_.toByte).toArray)
    }.toMap
    val dbf = entries("layer.dbf").clone()
    val headerLen = (dbf(8) & 0xff) | ((dbf(9) & 0xff) << 8)
    val recordLen = (dbf(10) & 0xff) | ((dbf(11) & 0xff) << 8)
    dbf(headerLen + recordLen) = 0x2a // delete record index 1
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    (entries + ("layer.dbf" -> dbf)).foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    val table = ShapefileSource.readShapefileBytes(spark, bos.toByteArray).fold(e => fail(e.message), identity)
    assert(table.df.orderBy("_row_number").collect().map(_.getString(0)).toSeq == Seq("1", "3"))
  }
}
