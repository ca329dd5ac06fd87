package graft

import org.apache.spark.sql.functions._
import graft.checks.RowChecks
import graft.runner.{ValidationConfig, ValidationRunner}
import graft.schema._

/** Per-check micro-tests with inline tables and tuple-normalised assertions —
  * the reference's conftest.py log() style: (row, col, code). */
class RowChecksSpec extends SparkSpec {
  import spark.implicits._

  private def fc = FieldConstraints()

  /** run plan() and normalise to (row, col, code) tuples sorted */
  private def tuples(
      df: org.apache.spark.sql.DataFrame,
      schema: TableSchema,
      opts: ValidationOptions = ValidationOptions.default
  ): Seq[(Long, Option[Int], String)] =
    ValidationRunner
      .plan(df, schema, ValidationConfig(rowNumberCol = "_rid", options = opts))
      .violations
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getInt(2)), r.getString(0)))
      .sortBy(t => (t._1, t._2.getOrElse(0)))
      .toSeq

  test("type-or-format-error: integer/number/date/boolean over string columns") {
    val df = Seq(
      (2L, "12", "1.5", "31/12/2020", "true"),
      (3L, "x", "abc", "2020-12-31", "maybe"),
      (4L, "-4", "2e3", "01/01/1999", "FALSE")
    ).toDF("_rid", "i", "n", "d", "b")
    val schema = TableSchema(
      Seq(
        Field("i", "integer"),
        Field("n", "number"),
        Field("d", "date", format = Some("%d/%m/%Y")),
        Field("b", "boolean")
      )
    )
    assert(
      tuples(df, schema) == Seq(
        (3L, Some(1), "type-or-format-error"),
        (3L, Some(2), "type-or-format-error"),
        (3L, Some(3), "type-or-format-error"),
        (3L, Some(4), "type-or-format-error")
      )
    )
  }

  test("typed physical columns skip type checks entirely (no-op conformance)") {
    val df = Seq((1L, 5, 1.5)).toDF("_rid", "i", "n")
    val schema = TableSchema(Seq(Field("i", "integer"), Field("n", "number")))
    val compiled = RowChecks.compile(schema, df.drop("_rid").schema, col("_rid"))
    assert(!compiled.exists(_.code == "type-or-format-error"))
  }

  test("required-constraint fires on null and empty string") {
    val df = Seq((2L, Some("x")), (3L, None), (4L, Some(""))).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    assert(
      tuples(df, schema, ValidationOptions(checks = Seq("schema"))) ==
        Seq((3L, Some(1), "required-constraint"), (4L, Some(1), "required-constraint"))
    )
  }

  test("enum / minimum / maximum / lengths / pattern") {
    val df = Seq(
      (2L, "a", 5.0, "hello"),
      (3L, "c", -1.0, "x"),
      (4L, "b", 101.0, "waaaaay too long here")
    ).toDF("_rid", "cat", "amt", "txt")
    val schema = TableSchema(
      Seq(
        Field("cat", constraints = fc.copy(enumVals = Some(Seq("a", "b")))),
        Field("amt", "number", constraints = fc.copy(minimum = Some(0), maximum = Some(100))),
        Field("txt", constraints = fc.copy(minLength = Some(2), maxLength = Some(10), pattern = Some("^[a-z ]+$")))
      )
    )
    assert(
      tuples(df, schema) == Seq(
        (3L, Some(1), "enumerable-constraint"),
        (3L, Some(2), "minimum-constraint"),
        (3L, Some(3), "minimum-length-constraint"),
        (4L, Some(2), "maximum-constraint"),
        (4L, Some(3), "maximum-length-constraint")
      )
    )
  }

  test("pattern-constraint is a FULL-string match (goodtables anchors the regex)") {
    // "ab1" CONTAINS a match for [0-9] but is not one — unanchored rlike
    // would wrongly accept it
    val df = Seq((2L, "7"), (3L, "ab1"), (4L, "42")).toDF("_rid", "v")
    val schema = TableSchema(Seq(Field("v", constraints = fc.copy(pattern = Some("[0-9]+")))))
    assert(tuples(df, schema) == Seq((3L, Some(1), "pattern-constraint")))
  }

  test("blank-row fires when every cell is empty/null") {
    val df = Seq(
      (2L, Some("x"), Some("y")),
      (3L, None, Some("")),
      (4L, None, None),
      (5L, Some(""), Some(" "))
    ).toDF("_rid", "a", "b")
    val schema = TableSchema(Seq(Field("a"), Field("b")))
    // row 3 (null, "") is also all-blank
    assert(tuples(df, schema) == Seq((3L, None, "blank-row"), (4L, None, "blank-row"), (5L, None, "blank-row")))
  }

  test("naValue ingestion turns the token into null before checks (jobs.py:132-133)") {
    val df = Seq((2L, "NA"), (3L, "ok")).toDF("_rid", "a")
    val schema =
      TableSchema(Seq(Field("a", constraints = fc.copy(required = true))), naValue = Some("NA"))
    assert(tuples(df, schema, ValidationOptions(checks = Seq("schema"))) == Seq((2L, Some(1), "required-constraint")))
  }

  test("violation messages are content-identical to the reference templates") {
    val df = Seq((2L, "c", 200.0)).toDF("_rid", "cat", "amt")
    val schema = TableSchema(
      Seq(
        Field("cat", constraints = fc.copy(enumVals = Some(Seq("a", "b")))),
        Field("amt", "number", constraints = fc.copy(maximum = Some(100)))
      )
    )
    val msgs = ValidationRunner
      .plan(df, schema, ValidationConfig(rowNumberCol = "_rid"))
      .violations
      .orderBy("column_number")
      .collect()
      .map(_.getString(3))
      .toSeq
    assert(
      msgs == Seq(
        "The value \"c\" in row 2 and column 1 is not found in the list of valid values for this field: \"a\", \"b\"",
        "The value \"200.0\" in row 2 and column 2 does not conform to the maximum constraint of 100"
      )
    )
  }

  test("row payload carries the full source row with nulls as empty strings") {
    val df = Seq((2L, Some("x"), None: Option[String])).toDF("_rid", "a", "b")
    val schema = TableSchema(Seq(Field("b", constraints = fc.copy(required = true))))
    val row = ValidationRunner
      .plan(df, schema, ValidationConfig(rowNumberCol = "_rid"))
      .violations
      .head()
      .getSeq[String](4)
    assert(row == Seq("x", ""))
  }

  test("skip_checks disables individual codes (README.md:242-250)") {
    val df = Seq((2L, "zzz")).toDF("_rid", "cat")
    val schema = TableSchema(Seq(Field("cat", constraints = fc.copy(enumVals = Some(Seq("a"))))))
    val opts = ValidationOptions(skipChecks = Seq("enumerable-constraint"))
    assert(tuples(df, schema, opts).isEmpty)
  }
}
