package graft

import org.apache.spark.sql.functions._
import graft.runner.{ValidationConfig, ValidationRunner}
import graft.schema._

/** The driver-side report path must stay bounded no matter how bad the data
  * is: a 100%-violating table collects at most errorLimitPerCode entries per
  * code (default 1000), and the row count rides the SAME job as the
  * violations via an Observation — no second pass over the source.
  */
class BoundedReportSpec extends SparkSpec {
  import spark.implicits._

  private def fc = FieldConstraints()

  test("run() over a 200k-row 100%-violating frame: capped errors, observed row count") {
    // every row violates required-constraint AND minimum-constraint
    val df = spark.range(1, 200001).select(col("id").as("_rid"), lit("").as("a"), lit(-5.0).as("b"))
    val schema = TableSchema(Seq(
      Field("a", constraints = fc.copy(required = true)),
      Field("b", "number", constraints = fc.copy(minimum = Some(0)))
    ))
    val (report, status) = ValidationRunner.run(df, schema, ValidationConfig(rowNumberCol = "_rid"))
    assert(status == "failure")
    val t = report.tables.head
    assert(t.rowCount == 200000L) // Observation saw every row, filter notwithstanding
    val byCode = t.errors.groupBy(_.code).view.mapValues(_.size).toMap
    assert(byCode == Map("required-constraint" -> 1000, "minimum-constraint" -> 1000))
    // cap keeps the FIRST violations per code (ordered by row number)
    assert(t.errors.filter(_.code == "required-constraint").flatMap(_.rowNumber).max == 1000L)
  }

  test("observed row count is exact when nothing violates") {
    val df = spark.range(1, 5001).select(col("id").as("_rid"), lit("x").as("a"))
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true))))
    val (report, status) = ValidationRunner.run(df, schema, ValidationConfig(rowNumberCol = "_rid"))
    assert(status == "success")
    assert(report.tables.head.rowCount == 5000L)
    assert(report.valid)
  }

  test("rowLimit path still reports the limit warning from the raw count") {
    val df = spark.range(1, 101).select(col("id").as("_rid"), lit("x").as("a"))
    val schema = TableSchema(Seq(Field("a")))
    val (report, _) = ValidationRunner.run(
      df, schema,
      ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(rowLimit = Some(10)))
    )
    assert(report.tables.head.rowCount == 10L)
    assert(report.warnings.exists(_.contains("10 row(s) limit")))
  }

  test("errorLimitPerCode = None opts out (fixture parity path)") {
    val df = spark.range(1, 1501).select(col("id").as("_rid"), lit("").as("a"), lit("x").as("b"))
    val schema = TableSchema(Seq(Field("a", constraints = fc.copy(required = true)), Field("b")))
    val (report, _) = ValidationRunner.run(
      df, schema,
      ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(errorLimitPerCode = None))
    )
    val byCode = report.tables.head.errors.groupBy(_.code).view.mapValues(_.size).toMap
    assert(byCode == Map("required-constraint" -> 1500), s"got $byCode")
    assert(report.tables.head.rowCount == 1500L)
  }
}
