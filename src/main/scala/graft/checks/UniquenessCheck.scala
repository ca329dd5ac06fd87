package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.report.ErrorSpec

/** Uniqueness checks — single-column `unique` constraints, the composite
  * primary-key check, and exact duplicate-row detection.
  *
  * Semantics pinned by the reference (custom_checks.py:90-174):
  *  - the FIRST occurrence of a value/tuple is NOT an error; every later
  *    occurrence is (cache.add happens after membership test,
  *    custom_checks.py:121-143);
  *  - tuples whose members are ALL null are skipped (custom_checks.py:118-119);
  *  - composite violations get a distinct message naming the PK fields
  *    (custom_checks.py:126-140).
  *
  * Scale design (the 100 TB path): instead of a global window sort, we do a
  * partial-aggregating `groupBy(key).agg(count, min(row_number))` — map-side
  * combine collapses duplicates before the shuffle, so a skewed key (e.g.
  * phash clusters of near-identical images) ships one partial row per map
  * task, not one row per duplicate. The tiny "keys with count>1" frame then
  * joins back to the fact; AQE turns that into a broadcast join when the
  * duplicate-key set is small (the common case) and handles residual skew
  * otherwise. Net cost: one partial-agg shuffle + (usually) zero-shuffle
  * broadcast join, vs. a full repartition+sort for the window formulation.
  */
object UniquenessCheck {

  /** Violations for one unique key group (single column or composite PK).
    *
    * @param df        source frame
    * @param keyCols   the unique column (size 1) or the composite primaryKey
    * @param rowNumber 1-based row-number column (must be unique per row)
    * @param columnNumber 1-based position of the (first) key column
    * @param primaryKeyFields names for the composite message; non-empty ⇒
    *                  composite semantics
    */
  def violations(
      df: DataFrame,
      payloadCols: Seq[String],
      keyCols: Seq[String],
      rowNumber: Column,
      columnNumber: Int,
      primaryKeyFields: Seq[String] = Nil,
      partitionId: Option[Column] = None
  ): DataFrame = {
    val rn = rowNumber.cast(LongType).as("_rn")
    val pid = partitionId.getOrElse(lit(null)).cast(IntegerType).as("_pid")
    val notAllNull = keyCols.map(col(_).isNotNull).reduce(_ || _)
    val base = df
      .filter(notAllNull)
      .select((keyCols.map(col) :+ rn :+ pid :+ RowChecks.rowPayload(payloadCols).as("row")): _*)

    // partial-agg shuffle: skew-robust thanks to map-side combine
    val firsts = base
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"), min(col("_rn")).as("_first"))
      .filter(col("_cnt") > 1)
      .select(keyCols.map(c => col(c).as(s"_k_$c")) :+ col("_first"): _*)

    val joinCond = keyCols.map(c => base(c) <=> firsts(s"_k_$c")).reduce(_ && _)
    val dupRows = base
      .join(firsts, joinCond, "inner")
      .filter(col("_rn") > col("_first"))

    val composite = primaryKeyFields.nonEmpty && keyCols.size > 1
    val msg =
      if (composite)
        RowChecks.message(
          "unique-constraint-composite",
          Map(
            "row_numbers" -> col("_rn").cast(StringType),
            "primary_key_fields" -> lit(primaryKeyFields.mkString(", "))
          )
        )
      else
        RowChecks.message(
          "unique-constraint",
          Map(
            "row_numbers" -> col("_rn").cast(StringType),
            "column_number" -> lit(columnNumber).cast(StringType)
          )
        )

    dupRows.select(
      lit("unique-constraint").as("code"),
      col("_rn").as("row_number"),
      lit(columnNumber).cast(IntegerType).as("column_number"),
      msg.as("message"),
      col("row"),
      col("_pid").as("partition_id")
    )
  }

  /** duplicate-row (custom_checks.py:467-478): exact duplicate of an earlier
    * row; message cites the earlier row-number. Grouping key is the full row —
    * at scale Spark's hash aggregate keys on all columns; pre-hashing with
    * xxhash64 only adds a collision-checking join, so we group directly and
    * let the partial agg absorb duplicates map-side. */
  def duplicateRows(
      df: DataFrame,
      payloadCols: Seq[String],
      rowNumber: Column,
      partitionId: Option[Column] = None
  ): DataFrame = {
    val cols = payloadCols
    val rn = rowNumber.cast(LongType).as("_rn")
    val pid = partitionId.getOrElse(lit(null)).cast(IntegerType).as("_pid")
    val base = df.select(cols.map(col) :+ rn :+ pid: _*)
    val firsts = base
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"), min(col("_rn")).as("_first"))
      .filter(col("_cnt") > 1)
      .select(cols.map(c => col(c).as(s"_k_$c")) :+ col("_first"): _*)
    val joinCond = cols.map(c => base(c) <=> firsts(s"_k_$c")).reduce(_ && _)
    base
      .join(firsts, joinCond, "inner")
      .filter(col("_rn") > col("_first"))
      .select(
        lit("duplicate-row").as("code"),
        col("_rn").as("row_number"),
        lit(null).cast(IntegerType).as("column_number"),
        RowChecks
          .message(
            "duplicate-row",
            Map(
              "row_number" -> col("_rn").cast(StringType),
              "row_numbers" -> col("_first").cast(StringType)
            )
          )
          .as("message"),
        RowChecks.rowPayload(cols).as("row"),
        col("_pid").as("partition_id")
      )
  }
}
