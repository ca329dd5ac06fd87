package graft.report

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Report sinks — the engine's equivalents of the reference's outputs:
  * the per-error CSV report (commands.py:273-332) and the violations table
  * (the JSON report itself is ValidationReport.toJson).
  */
object ReportSink {

  /** Write a violations frame as a CSV report with the reference's column
    * vocabulary (commands.py:275-281), capped per error code
    * (commands.py:215: ≤`capPerCode` occurrences of the same code). */
  def writeCsv(violations: DataFrame, path: String, capPerCode: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("code")).orderBy(col("row_number").asc_nulls_first)
    val capped = violations
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= capPerCode)
      .select(
        col("code").as("error_type"),
        col("row_number"),
        col("column_number"),
        col("message"),
        concat_ws("|", col("row")).as("row_values")
      )
    capped.coalesce(1).write.mode(SaveMode.Overwrite).option("header", true).csv(path)
    capped
  }

  /** Append violations to a parquet sink partitioned by run for pruned
    * re-reads (the report-persistence half of the reference's Validation
    * row, model.py:27-46). */
  def appendParquet(violations: DataFrame, path: String, runId: String): Unit =
    violations
      .withColumn("run_id", lit(runId))
      .write
      .mode(SaveMode.Append)
      .parquet(path)
}
