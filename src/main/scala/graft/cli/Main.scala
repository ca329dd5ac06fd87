package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.runner.{Lineage, ValidationConfig, ValidationRunner}
import graft.schema.{TableSchema, ValidationOptions}

/** spark-submit entrypoint — the engine's equivalent of the reference's
  * validation job + CLI (logic.py:69-144 action, commands.py:116-177 CLI).
  *
  * Usage:
  *   spark-submit --class graft.cli.Main <jar> run \
  *     --input <parquet path> --schema <descriptor.json> \
  *     --row-number-col <col> [--key <col> --partitions N --batch B \
  *     --lineage <dir> --run-id <id> --violations <dir>] \
  *     [--report <out.json>] [--records <dir>] [--allow-invalid] \
  *     [--row-limit N] [--checks a,b,c] [--skip-checks x,y]
  *
  * Exit code: 0 on success, 1 on validation failure (the fail-closed
  * admission gate, logic.py:689-708), 2 on usage/schema errors.
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val m = collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case flag if flag.startsWith("--") =>
          if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
            m(flag.drop(2)) = args(i + 1); i += 2
          } else { m(flag.drop(2)) = "true"; i += 1 }
        case _ => i += 1
      }
    }
    m.toMap
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty || (args(0) != "run" && args(0) != "run-batch")) {
      System.err.println(
        "usage: Main run --input <parquet> --schema <json> --row-number-col <col> [...]\n" +
          "       Main run-batch --inputs <p1,p2,...> --schema <json> --row-number-col <col> [...]"
      )
      sys.exit(2)
    }
    val a = parseArgs(args.drop(1))
    if (args(0) == "run-batch") { runBatch(a); return }
    val input = a.getOrElse("input", { System.err.println("--input required"); sys.exit(2); "" })
    val schemaArg = a.getOrElse("schema", { System.err.println("--schema required"); sys.exit(2); "" })
    val rowCol = a.getOrElse("row-number-col", { System.err.println("--row-number-col required"); sys.exit(2); "" })

    val schemaJson =
      if (schemaArg.trim.startsWith("{")) schemaArg
      else new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(schemaArg)), "UTF-8")

    val schema = TableSchema.parse(schemaJson) match {
      case Right(s) => s
      case Left(err) =>
        // schema-error path: invalid descriptor fails before any job runs
        System.err.println(s"Table Schema error: ${err.message}")
        sys.exit(2); null
    }

    val builder = SparkSession
      .builder()
      .appName("graft-validation")
      .config("spark.sql.ansi.enabled", "false")
    // spark-submit injects spark.master; default to local[*] when launched
    // directly (sbt runMain, tests)
    val spark =
      (if (sys.props.contains("spark.master")) builder else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(input)
    val opts = ValidationOptions(
      checks = a.get("checks").map(_.split(",").toSeq).getOrElse(ValidationOptions.default.checks),
      skipChecks = a.get("skip-checks").map(_.split(",").toSeq).getOrElse(Nil),
      rowLimit = a.get("row-limit").map(_.toLong),
      errorLimitPerCode = a.get("error-limit").map(_.toInt)
    )
    val cfg = ValidationConfig(rowNumberCol = rowCol, source = input, options = opts)

    val exitCode = a.get("lineage") match {
      case Some(lineageDir) =>
        val key = col(a.getOrElse("key", rowCol))
        val runId = a.getOrElse("run-id", java.util.UUID.randomUUID().toString)
        // an ingestPartitioned table (physical _pid directories + persisted
        // bucket count) takes the PARTITION-PRUNED resume path: each batch
        // reads only its own buckets' files instead of re-scanning the table
        val stored = new java.io.File(input, "_graft_num_partitions.txt").exists()
        val res =
          if (stored)
            Lineage.runResumableStored(
              spark, input, schema, cfg,
              batchSize = a.getOrElse("batch", "16").toInt,
              lineageDir = lineageDir,
              runId = runId,
              violationsDir = a.get("violations")
            )
          else
            Lineage.runResumable(
              df, schema, cfg, key,
              numPartitions = a.getOrElse("partitions", "64").toInt,
              batchSize = a.getOrElse("batch", "16").toInt,
              lineageDir = lineageDir,
              runId = runId,
              violationsDir = a.get("violations")
            )
        println(
          s"""{"run_id":"$runId","partitions":${res.verdicts.size},"resumed":${res.resumedPartitions.size},"violations":${res.totalViolations},"valid":${res.valid}}"""
        )
        if (res.valid || a.contains("allow-invalid")) 0 else 1
      case None =>
        a.get("records") match {
          case Some(recordDir) =>
            // full lifecycle through the validation-record state machine
            // (created -> running -> terminal, trapped errors -> status
            // error) with every transition in the record log
            val (rec, report) = graft.runner.ValidationRecord
              .runRecorded(spark, recordDir, input, df, schema, cfg)
            println(
              s"""{"status":"${rec.status}","record_id":"${rec.id}","valid":${report.exists(_.valid)}}""")
            a.get("report").foreach { out =>
              report.foreach(r => java.nio.file.Files.writeString(java.nio.file.Paths.get(out), r.toJson))
            }
            if (report.exists(_.valid) || a.contains("allow-invalid")) 0 else 1
          case None =>
            val (report, status) = ValidationRunner.run(df, schema, cfg)
            a.get("report").foreach { out =>
              java.nio.file.Files.writeString(java.nio.file.Paths.get(out), report.toJson)
            }
            println(s"""{"status":"$status","error_count":${report.errorCount},"valid":${report.valid}}""")
            if (report.valid || a.contains("allow-invalid")) 0 else 1
        }
    }
    spark.stop()
    sys.exit(exitCode)
  }

  /** Batch fan-out (reference `resource_validation_run_batch`,
    * logic.py:223-337): validate a list of tables in one session, one run
    * each; print per-table status lines + a summary count; exit 1 if any
    * table failed. */
  private def runBatch(a: Map[String, String]): Unit = {
    val inputs = a.getOrElse("inputs", { System.err.println("--inputs required"); sys.exit(2); "" })
      .split(",").toSeq.filter(_.nonEmpty)
    val schemaArg = a.getOrElse("schema", { System.err.println("--schema required"); sys.exit(2); "" })
    val rowCol = a.getOrElse("row-number-col", { System.err.println("--row-number-col required"); sys.exit(2); "" })
    val schemaJson =
      if (schemaArg.trim.startsWith("{")) schemaArg
      else new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(schemaArg)), "UTF-8")
    val schema = TableSchema.parse(schemaJson) match {
      case Right(s) => s
      case Left(err) => System.err.println(s"Table Schema error: ${err.message}"); sys.exit(2); null
    }
    val builder = SparkSession.builder().appName("graft-validation-batch").config("spark.sql.ansi.enabled", "false")
    val spark = (if (sys.props.contains("spark.master")) builder else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failures = 0
    inputs.foreach { input =>
      val status =
        try {
          val df = spark.read.parquet(input)
          val (report, st) =
            ValidationRunner.run(df, schema, ValidationConfig(rowNumberCol = rowCol, source = input))
          if (!report.valid) failures += 1
          st
        } catch {
          case e: Exception => failures += 1; s"error (${e.getMessage.takeWhile(_ != '\n')})"
        }
      println(s"""{"input":"$input","status":"$status"}""")
    }
    println(s"""{"tables":${inputs.size},"failures":$failures}""")
    spark.stop()
    sys.exit(if (failures > 0 && !a.contains("allow-invalid")) 1 else 0)
  }
}
