package graft.report

/** One violation row — the unit of output the engine must reproduce
  * content-for-content against the reference's report error entries
  * (reference: tests/helpers.py:51-65; row payload added at jobs.py:178-192).
  *
  * `rowNumber` is 1-based over data rows; header errors have rowNumber=None.
  * `row` is the full source row rendered as strings with nulls → ""
  * (jobs.py:183-186 NaN→"" fill).
  */
final case class Violation(
    code: String,
    rowNumber: Option[Long],
    columnNumber: Option[Int],
    message: String,
    row: Seq[String]
)

/** Per-table section of the validation report
  * (reference report shape: tests/helpers.py:20-114). */
final case class TableReport(
    source: String,
    headers: Seq[String],
    rowCount: Long,
    errorCount: Long,
    time: Double,
    valid: Boolean,
    errors: Seq[Violation]
)

/** Whole-run report: `{valid, error-count, table-count, time, warnings,
  * tables}` (tests/helpers.py:20-49). */
final case class ValidationReport(
    valid: Boolean,
    errorCount: Long,
    tableCount: Int,
    time: Double,
    warnings: Seq[String],
    tables: Seq[TableReport]
) {

  /** Serialise with the reference's exact JSON key spelling
    * (kebab-case `error-count` / `row-number` etc., tests/helpers.py:20-114). */
  def toJson: String = {
    def esc(s: String): String = s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }
    def jStr(s: String) = "\"" + esc(s) + "\""
    def jArr(xs: Seq[String]) = xs.mkString("[", ", ", "]")
    def jErr(v: Violation) = {
      val rn = v.rowNumber.map(_.toString).getOrElse("null")
      val cn = v.columnNumber.map(_.toString).getOrElse("null")
      s"""{"code": ${jStr(v.code)}, "row-number": $rn, "column-number": $cn, "message": ${jStr(
          v.message
        )}, "row": ${jArr(v.row.map(jStr))}}"""
    }
    def jTable(t: TableReport) =
      s"""{"source": ${jStr(t.source)}, "headers": ${jArr(t.headers.map(jStr))}, "row-count": ${t.rowCount}, "error-count": ${t.errorCount}, "time": ${t.time}, "valid": ${t.valid}, "errors": ${jArr(
          t.errors.map(jErr)
        )}}"""
    s"""{"valid": $valid, "error-count": $errorCount, "table-count": $tableCount, "time": $time, "warnings": ${jArr(
        warnings.map(jStr)
      )}, "tables": ${jArr(tables.map(jTable))}}"""
  }
}

/** Run lifecycle status, mirroring the reference's validation-record state
  * machine (reference: logic.py:154-162 docstring; jobs.py:27-51). */
object RunStatus {
  val Created = "created"
  val Running = "running"
  val Error = "error"
  val Success = "success"
  val Failure = "failure"
}
