package graft

import java.nio.file.Files

import graft.report.{PostProcess, ValidationReport, Violation, TableReport}
import graft.runner.ValidationRunner
import graft.schema._
import graft.sources.TableSource

/** Source readers, ragged-row structure checks, and report post-processing —
  * the INVALID_CSV/VALID_CSV fixture path (tests/helpers.py:12-18,
  * tests/test_logic.py:436-519). */
class SourceSpec extends SparkSpec {

  private def fc = FieldConstraints()

  private def writeTmp(name: String, content: String): String = {
    val f = Files.createTempDirectory("graft_src").resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  // the reference fixtures, verbatim (tests/helpers.py:12-18)
  private val INVALID_CSV = "a,b,c,d\n1,2,3\n"
  private val VALID_CSV = "a,b,c,d\n1,2,3,4\n"

  private val abcdSchema =
    TableSchema(Seq(Field("a"), Field("b"), Field("c"), Field("d")))

  test("INVALID_CSV: exactly 'Row 2 has a missing value in column 4' (tests/test_logic.py:466-467)") {
    val path = writeTmp("invalid.csv", INVALID_CSV)
    val (report, status) = ValidationRunner.runCsv(spark, path, abcdSchema)
    assert(status == "failure")
    assert(report.errorCount == 1)
    val e = report.tables.head.errors.head
    assert(e.code == "missing-value")
    assert(e.message == "Row 2 has a missing value in column 4")
    assert(e.rowNumber.contains(2L))
    assert(e.columnNumber.contains(4))
    assert(report.tables.head.rowCount == 2) // header + 1 data row
    assert(report.tables.head.headers == Seq("a", "b", "c", "d"))
  }

  test("VALID_CSV: success, zero errors (tests/test_logic.py:497-519)") {
    val path = writeTmp("valid.csv", VALID_CSV)
    val (report, status) = ValidationRunner.runCsv(spark, path, abcdSchema)
    assert(status == "success")
    assert(report.valid && report.errorCount == 0)
  }

  test("extra-value on rows wider than the header") {
    val path = writeTmp("extra.csv", "a,b\n1,2\n1,2,3\n")
    val Right(csv) = TableSource.readCsv(spark, path): @unchecked
    val e = csv.structureViolations.head
    assert(e.code == "extra-value")
    assert(e.rowNumber.contains(3L))
    assert(e.message == "Row 3 has an extra value in column 3")
  }

  test("source failure taxonomy: io-error, format-error, source-error, encoding-error") {
    assert(TableSource.readCsv(spark, "/nonexistent/x.csv").swap.toOption.get.code == "io-error")
    assert(TableSource.formatOf("data.xyz").swap.toOption.get.code == "format-error")
    val empty = writeTmp("empty.csv", "")
    assert(TableSource.readCsv(spark, empty).swap.toOption.get.code == "source-error")
    val badBytes = Files.createTempDirectory("graft_src").resolve("bad.csv")
    Files.write(badBytes, Array[Byte]('a', ',', 'b', '\n', 0xff.toByte, 0xfe.toByte, '1'))
    assert(TableSource.readCsv(spark, badBytes.toString).swap.toOption.get.code == "encoding-error")
  }

  test("source failure produces the zero-table ERROR_REPORT with status error (tests/helpers.py:85-89)") {
    val (report, status) = ValidationRunner.runCsv(spark, "/nonexistent/x.csv", abcdSchema)
    assert(status == "error")
    assert(!report.valid && report.tableCount == 0 && report.errorCount == 0)
    assert(report.warnings.nonEmpty)
  }

  test("json reader: array of objects, corrupt input is a source-error") {
    val good = writeTmp("ok.json", """[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]""")
    val df = TableSource.readJson(spark, good).toOption.get
    assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("a", "b"))
    val bad = writeTmp("bad.json", """this is not json""")
    assert(TableSource.readJson(spark, bad).swap.toOption.get.code == "source-error")
  }

  test("geojson: features flattened to properties.* + adr_geometry_check (jobs.py:297-332)") {
    val geo = writeTmp("adr.geojson",
      """{"type": "FeatureCollection", "features": [
        |  {"type": "Feature", "properties": {"name": "depot", "capacity": 12},
        |   "geometry": {"type": "Point", "coordinates": [6.1, 49.6]}},
        |  {"type": "Feature", "properties": {"name": "annex", "capacity": 3},
        |   "geometry": null},
        |  {"type": "Feature", "properties": {"name": "yard", "capacity": 7},
        |   "geometry": {"type": "Point", "coordinates": []}}
        |]}""".stripMargin)
    val df = TableSource.readJson(spark, geo).toOption.get
    assert(df.columns.sorted.toSeq == Seq("adr_geometry_check", "capacity", "name"))
    val rows = df.collect().map(r => r.getAs[String]("name") -> r.getAs[Boolean]("adr_geometry_check")).toMap
    assert(rows == Map("depot" -> true, "annex" -> false, "yard" -> false))

    // ...and the synthesized column feeds the missing-geometry check
    import org.apache.spark.sql.functions._
    val withRid = df.withColumn("_rid", col("capacity").cast("long"))
    val schema = TableSchema(Seq(Field("adr_geometry_check")))
    val v = ValidationRunner
      .plan(withRid, schema, graft.runner.ValidationConfig(rowNumberCol = "_rid"))
      .violations.filter(col("code") === "missing-geometry")
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(v == Seq(3L, 7L)) // annex (capacity 3) and yard (capacity 7)
  }

  test("transpose: small sideways frame (jobs.py:390-396)") {
    import spark.implicits._
    val df = Seq(("r1", "1", "2"), ("r2", "3", "4")).toDF("k", "x", "y")
    val t = TableSource.transpose(df)
    val rows = t.collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(rows == Seq(Seq("k", "r1", "r2"), Seq("x", "1", "3"), Seq("y", "2", "4")))
  }

  test("column reorder mapping + violation remap (jobs.py:489-542)") {
    val headers = Seq("x", "a", "b")
    val schema = TableSchema(Seq(Field("a"), Field("b")))
    val (ordered, mapping) = PostProcess.schemaOrder(headers, schema)
    assert(ordered == Seq("a", "b", "x"))
    assert(mapping == Map(1 -> 2, 2 -> 3, 3 -> 1))
    val v = Violation("required-constraint", Some(5L), Some(1), "Column 1 is a required field, but row 5 has no value", Nil)
    val remapped = PostProcess.remapColumnNumbers(Seq(v), mapping).head
    assert(remapped.columnNumber.contains(2))
    assert(remapped.message == "Column 2 is a required field, but row 5 has no value")
  }

  test("transposition correction swaps row/column wording (jobs.py:399-407)") {
    val rep = ValidationReport(
      valid = false, errorCount = 1, tableCount = 1, time = 0, warnings = Nil,
      tables = Seq(TableReport("s", Nil, 1, 1, 0, valid = false,
        errors = Seq(Violation("missing-value", Some(2L), Some(4), "Row 2 has a missing value in column 4", Nil))))
    )
    val swapped = PostProcess.swapRowColumnWording(rep)
    assert(swapped.tables.head.errors.head.message == "Column 2 has a missing value in row 4")
  }

  test("source hiding rewrites tables[].source (jobs.py:155-160)") {
    val rep = ValidationReport(true, 0, 1, 0, Nil, Seq(TableReport("/data/local/file", Nil, 1, 0, 0, true, Nil)))
    assert(PostProcess.hideSource(rep, "http://example.com/x.csv").tables.head.source == "http://example.com/x.csv")
  }
}
