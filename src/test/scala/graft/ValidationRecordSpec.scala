package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.report.RunStatus
import graft.runner.{ValidationConfig, ValidationRecord}
import graft.schema._

/** Run-level record state machine (model.py:27-36, jobs.py:27-51,
  * logic.py:154-162) and the validation_options acceptance surface
  * (validators.py:49-68). */
class ValidationRecordSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_rec").toString + "/records"

  test("lifecycle: created -> running -> failure, with timestamps and report payload") {
    val dir = tmp()
    val df = Seq((1L, ""), (2L, "x")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a", constraints = FieldConstraints(required = true))))
    val (rec, report) = ValidationRecord.runRecorded(
      spark, dir, "res1", df, schema, ValidationConfig(rowNumberCol = "_rid"))
    assert(rec.status == RunStatus.Failure)
    assert(rec.finished.isDefined && rec.finished.get >= rec.created)
    assert(report.exists(!_.valid))
    assert(rec.report_json.exists(_.contains("\"valid\": false")))
    // the log holds the full transition history; latest is the terminal row
    val log = spark.read.parquet(dir).orderBy("updated").collect().map(_.getAs[String]("status"))
    assert(log.toSeq == Seq("created", "running", "failure"))
    assert(ValidationRecord.latest(spark, dir, "res1").get.status == RunStatus.Failure)
  }

  test("a crash inside the engine traps to status error with the error payload (jobs.py:45-48)") {
    val dir = tmp()
    val df = Seq((1L, "x")).toDF("_rid", "a")
    // a schema referencing a column whose cast crashes plan analysis is hard
    // to fake; instead pass a frame whose rowNumberCol is missing
    val schema = TableSchema(Seq(Field("a")))
    val (rec, report) = ValidationRecord.runRecorded(
      spark, dir, "res2", df, schema, ValidationConfig(rowNumberCol = "_no_such_col"))
    assert(rec.status == RunStatus.Error)
    assert(rec.error.nonEmpty)
    assert(rec.report_json.contains("""{"valid": false}"""))
    assert(report.isEmpty)
  }

  test("re-run resets a terminal record to created with a NEW id (logic.py:120-131)") {
    val dir = tmp()
    val df = Seq((1L, "x")).toDF("_rid", "a")
    val schema = TableSchema(Seq(Field("a")))
    val (r1, _) = ValidationRecord.runRecorded(spark, dir, "res3", df, schema, ValidationConfig(rowNumberCol = "_rid"))
    assert(r1.status == RunStatus.Success)
    val (r2, _) = ValidationRecord.runRecorded(spark, dir, "res3", df, schema, ValidationConfig(rowNumberCol = "_rid"))
    assert(r2.status == RunStatus.Success)
    assert(r2.id != r1.id)
    val statuses = spark.read.parquet(dir).filter(col("resource_id") === "res3")
      .orderBy("updated").collect().map(_.getAs[String]("status")).toSeq
    assert(statuses == Seq("created", "running", "success", "created", "running", "success"))
  }

  test("illegal transitions are rejected") {
    val r = ValidationRecord.create("x", 1L)
    intercept[ValidationRecord.IllegalTransition] {
      ValidationRecord.transition(r, RunStatus.Success, 2L) // created -> success skips running
    }
    val running = ValidationRecord.transition(r, RunStatus.Running, 2L)
    intercept[ValidationRecord.IllegalTransition] {
      ValidationRecord.transition(running, RunStatus.Created, 3L) // running cannot reset
    }
  }

  test("validation_options acceptance: object, string-encoded object, junk rejected (validators.py:49-68)") {
    val o = ValidationOptions.parse("""{"checks": ["schema"], "skip_checks": ["pattern-constraint"], "row_limit": 100}""")
    assert(o == Right(ValidationOptions(Seq("schema"), Seq("pattern-constraint"), Some(100L))))
    // a JSON string ENCODING an object (form-field case)
    val s = ValidationOptions.parse(""""{\"checks\": [\"structure\"]}"""")
    assert(s.toOption.get.checks == Seq("structure"))
    // explicit error-cap opt-out vs default
    assert(ValidationOptions.parse("""{}""").toOption.get.errorLimitPerCode == Some(1000))
    assert(ValidationOptions.parse("""{"error_limit_per_code": null}""").toOption.get.errorLimitPerCode.isEmpty)
    // junk is rejected, never coerced
    assert(ValidationOptions.parse("""[1,2]""").isLeft)
    assert(ValidationOptions.parse(""""not json at all"""").isLeft)
    assert(ValidationOptions.parse("""totally broken""").isLeft)
  }
}
