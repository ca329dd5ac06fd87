package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.checks.HeaderChecks
import graft.report.{ErrorSpec, Violation}
import graft.runner.{ValidationConfig, ValidationRunner}
import graft.schema._

/** Golden-report parity: the report JSON shape and error entries must match
  * the reference's fixtures check-for-check (tests/helpers.py:20-114). */
class ReportSpec extends SparkSpec {
  import spark.implicits._

  private def fc = FieldConstraints()

  test("header checks: blank and duplicate headers with fixture-exact messages") {
    val v = HeaderChecks.violations(
      Seq("name", "ward", "", "other", "other"),
      TableSchema(Seq(Field("name"), Field("ward"), Field("party"), Field("other"), Field("other")))
    )
    val blank = v.find(_.code == "blank-header").get
    assert(blank.columnNumber.contains(3))
    assert(blank.message == "Header in column 3 is blank")
    assert(blank.rowNumber.isEmpty)
    val dup = v.find(_.code == "duplicate-header").get
    assert(dup.columnNumber.contains(5))
    assert(dup.message == "Header in column 5 is duplicated to header in column(s) 4")
  }

  test("header checks: non-matching / extra / missing headers") {
    val schema = TableSchema(Seq(Field("a"), Field("b")))
    val v = HeaderChecks.violations(Seq("b", "a", "c"), schema)
    assert(v.exists(x => x.code == "non-matching-header" && x.columnNumber.contains(1)))
    assert(v.exists(x => x.code == "extra-header" && x.columnNumber.contains(3)))
    // with require_field_order=false positional mismatches vanish
    val v2 = HeaderChecks.violations(Seq("b", "a"), schema.copy(requireFieldOrder = false))
    assert(!v2.exists(_.code == "non-matching-header"))
    val v3 = HeaderChecks.violations(Seq("a"), schema)
    assert(v3.exists(x => x.code == "missing-header" && x.columnNumber.contains(2)))
  }

  test("full run produces a reference-shaped report (INVALID_REPORT shape, tests/helpers.py:45-82)") {
    val df = Seq(
      (2L, "a", 10.0),
      (3L, "", -5.0),
      (4L, "a", 20.0)
    ).toDF("_rid", "name", "amount")
    val schema = TableSchema(
      Seq(
        Field("name", constraints = fc.copy(required = true)),
        Field("amount", "number", constraints = fc.copy(minimum = Some(0)))
      )
    )
    val (report, status) = ValidationRunner.run(
      df,
      schema,
      ValidationConfig(rowNumberCol = "_rid", source = "http://example.com/valid.csv", headerInRowCount = true)
    )
    assert(status == "failure")
    assert(!report.valid)
    assert(report.errorCount == 2)
    assert(report.tableCount == 1)
    val t = report.tables.head
    assert(t.source == "http://example.com/valid.csv")
    assert(t.headers == Seq("name", "amount"))
    assert(t.rowCount == 4) // 3 data rows + header
    assert(!t.valid)
    val e1 = t.errors.head
    assert(e1.code == "required-constraint")
    assert(e1.rowNumber.contains(3L))
    assert(e1.columnNumber.contains(1))
    assert(e1.message == "Column 1 is a required field, but row 3 has no value")
    assert(e1.row == Seq("", "-5.0"))
    val e2 = t.errors(1)
    assert(e2.code == "minimum-constraint")
    assert(e2.rowNumber.contains(3L))
    assert(e2.columnNumber.contains(2))

    // JSON round-trip uses the reference's kebab-case keys
    val json = JsonMethods.parse(report.toJson)
    assert((json \ "error-count") == JInt(2))
    assert((json \ "table-count") == JInt(1))
    assert((json \ "valid") == JBool(false))
    val err0 = ((json \ "tables")(0) \ "errors")(0)
    assert((err0 \ "row-number") == JInt(3))
    assert((err0 \ "column-number") == JInt(1))
  }

  test("valid table: success status, VALID_REPORT shape") {
    val df = Seq((2L, "x", 1.0)).toDF("_rid", "name", "amount")
    val schema =
      TableSchema(Seq(Field("name", constraints = fc.copy(required = true)), Field("amount", "number")))
    val (report, status) = ValidationRunner.run(df, schema, ValidationConfig(rowNumberCol = "_rid"))
    assert(status == "success")
    assert(report.valid && report.errorCount == 0 && report.tables.head.errors.isEmpty)
  }

  test("row limit emits the goodtables warning (tests/test_jobs.py:233-235)") {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a")))
    val (report, _) = ValidationRunner.run(
      df,
      schema,
      ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(rowLimit = Some(10)))
    )
    assert(report.warnings == Seq("Table inspection has reached 10 row(s) limit"))
    assert(report.tables.head.rowCount == 10)
  }

  test("error cap per code limits collected errors (commands.py:215)") {
    val df = (1L to 50L).map(i => (i, "")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val (report, _) = ValidationRunner.run(
      df,
      schema,
      ValidationConfig(
        rowNumberCol = "_rid",
        options = ValidationOptions(checks = Seq("schema"), errorLimitPerCode = Some(10))
      )
    )
    assert(report.tables.head.errors.size == 10)
    assert(report.tables.head.errors.map(_.rowNumber.get) == (1L to 10L))
  }

  test("admission gate: invalid table rejected unless allow_invalid_data (logic.py:653-708)") {
    val df = Seq((2L, "")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val cfg = ValidationConfig(rowNumberCol = "_rid")
    assert(ValidationRunner.validateOrReject(df, schema, cfg).isLeft)
    assert(ValidationRunner.validateOrReject(df, schema, cfg, allowInvalidData = true).isRight)
  }

  test("every reference error code has a spec entry with type/context/weight") {
    val codes = Seq(
      "io-error", "http-error", "source-error", "scheme-error", "format-error", "encoding-error",
      "blank-header", "duplicate-header", "blank-row", "duplicate-row", "extra-value", "missing-value",
      "schema-error", "non-matching-header", "extra-header", "missing-header",
      "type-or-format-error", "required-constraint", "pattern-constraint", "unique-constraint",
      "enumerable-constraint", "minimum-constraint", "maximum-constraint",
      "minimum-length-constraint", "maximum-length-constraint", "missing-geometry", "foreign-key",
      "custom-constraint"
    )
    codes.foreach { c =>
      val d = ErrorSpec(c)
      assert(d.template.nonEmpty && d.weight > 0 && Seq("source", "structure", "schema", "custom").contains(d.errType))
    }
  }

  test("PipelineWarnings lands the no-silent-caps beacons on the report warnings channel") {
    import org.apache.spark.sql.functions.col
    // hot fixture from TextDedupSpec: distinct near-dup variants, maxBucket=1
    // forces the hot path; hotSample covering the buckets makes recovery fire
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val docs = (0 until 12).map(i => (i.toLong + 1, s"$base extra$i tail$i")).toDF("doc_id", "text")
    val pw = graft.report.PipelineWarnings.register(spark)
    try {
      graft.dedup.Dedup
        .minHashPairs(docs, col("text"), col("doc_id"), threshold = 0.3, maxBucket = 1, hotSample = 12)
        .collect()
      val warnings = pw.await(minBeacons = 2)
      assert(warnings.exists(_.startsWith("MinHash LSH hot-bucket narrowing was live:")), warnings.toString)
      assert(warnings.exists(_.startsWith("MinHash hot-bucket sample recovered")), warnings.toString)
      // the run report carries them through the reference's warning channel
      val df = Seq((1L, "x")).toDF("_rid", "a")
      val (report, _) = ValidationRunner.run(df, TableSchema(Seq(Field("a"))), ValidationConfig(rowNumberCol = "_rid"))
      val merged = report.copy(warnings = report.warnings ++ warnings)
      warnings.foreach(w => assert(merged.toJson.contains(w.take(30))))
    } finally pw.close()
  }
}
