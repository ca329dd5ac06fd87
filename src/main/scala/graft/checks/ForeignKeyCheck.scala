package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.schema.{InlineValues, NotFoundRef, TableRef}
import graft.report.ErrorSpec

/** Referential-integrity check (reference ForeignKeyCheck,
  * custom_checks.py:206-329).
  *
  * Reference semantics:
  *  - value compared AS STRING against the referenced column's values
  *    (`str(cell['value']) not in valid_values`, custom_checks.py:259);
  *  - dimension fetched with `limit: 3000` (custom_checks.py:316-320) — i.e.
  *    the reference always materialises a small build side: that IS a
  *    broadcast hash join. We broadcast when the dimension is declared small
  *    and fall back to a shuffled (sort-merge / AQE-chosen) LEFT ANTI join for
  *    large dimensions — the "broadcast or sort-merge depending on dimension
  *    size" requirement of the north rule;
  *  - unresolvable reference ⇒ ONE "No foreign-key reference found" error on
  *    the first row (row-number ≤ 2, custom_checks.py:244-252), not one per
  *    row.
  */
object ForeignKeyCheck {

  /** Per-row misses of `df.fieldName` against `dim.refField`, as violation
    * rows. Left anti join: rows whose value has no match in the dimension.
    *
    * @param broadcastDim force-broadcast the dimension build side (the
    *   reference's ≤3000-value cache is always broadcast); when false, the
    *   join strategy is left to Catalyst/AQE (sort-merge for big dims,
    *   runtime-converted broadcast for small ones).
    */
  def violations(
      df: DataFrame,
      payloadCols: Seq[String],
      fieldName: String,
      columnNumber: Int,
      rowNumber: Column,
      dim: DataFrame,
      refField: String,
      resourceId: String = "",
      broadcastDim: Boolean = false,
      partitionId: Option[Column] = None
  ): DataFrame = {
    val rn = rowNumber.cast(LongType).as("_rn")
    val pid = partitionId.getOrElse(lit(null)).cast(IntegerType).as("_pid")
    val base = df.select(
      col(fieldName).cast(StringType).as("_fk_val"),
      rn,
      pid,
      RowChecks.rowPayload(payloadCols).as("row")
    )
    val dimVals0 = dim.select(col(refField).cast(StringType).as("_dim_val")).distinct()
    val dimVals = if (broadcastDim) broadcast(dimVals0) else dimVals0
    // null-safe: a null FK value stringifies to "None" in the reference and
    // never matches ⇒ treat null as a miss too (anti join keeps null keys).
    base
      .join(dimVals, base("_fk_val") === dimVals("_dim_val"), "left_anti")
      .select(
        lit("foreign-key").as("code"),
        col("_rn").as("row_number"),
        lit(columnNumber).cast(IntegerType).as("column_number"),
        RowChecks
          .message(
            "foreign-key",
            Map(
              "column_number" -> lit(columnNumber).cast(StringType),
              "row_number" -> col("_rn").cast(StringType),
              "resource_id" -> lit(resourceId)
            )
          )
          .as("message"),
        col("row"),
        col("_pid").as("partition_id")
      )
  }

  /** The single missing-reference violation (NOTFOUND sentinel,
    * custom_checks.py:244-252): emitted once, carrying the first row's
    * number and payload. */
  def missingReference(
      df: DataFrame,
      payloadCols: Seq[String],
      columnNumber: Int,
      rowNumber: Column,
      partitionId: Option[Column] = None
  ): DataFrame = {
    val rn = rowNumber.cast(LongType).as("_rn")
    val pid = partitionId.getOrElse(lit(null)).cast(IntegerType).as("_pid")
    df.select(rn, pid, RowChecks.rowPayload(payloadCols).as("row"))
      .orderBy(col("_rn"))
      .limit(1)
      .select(
        lit("foreign-key").as("code"),
        col("_rn").as("row_number"),
        lit(columnNumber).cast(IntegerType).as("column_number"),
        lit(ErrorSpec.template("foreign-key-notfound")).as("message"),
        col("row"),
        col("_pid").as("partition_id")
      )
  }
}
