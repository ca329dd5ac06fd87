package graft.report

import graft.schema.TableSchema

/** Report post-processing operators (reference jobs.py:155-200) — each must
  * be reproduced for check-for-check fixture parity.
  */
object PostProcess {

  /** Column-order correction (jobs.py:162-167, 489-525/528-542): when the
    * table was projected to schema order before validation, reported column
    * numbers must map back to the ORIGINAL column positions, message text
    * included. `mapping` is validatedPos -> originalPos (1-based). */
  def remapColumnNumbers(violations: Seq[Violation], mapping: Map[Int, Int]): Seq[Violation] =
    violations.map { v =>
      v.columnNumber match {
        case Some(cn) if mapping.contains(cn) && mapping(cn) != cn =>
          val orig = mapping(cn)
          v.copy(
            columnNumber = Some(orig),
            message = v.message
              .replace(s"column $cn", s"column $orig")
              .replace(s"Column $cn", s"Column $orig")
          )
        case _ => v
      }
    }

  /** Compute the reorder of `headers` into schema-field order (schema fields
    * first, in schema order, then extras in original order) and the
    * validatedPos -> originalPos mapping. Mirrors jobs.py:489-525. */
  def schemaOrder(headers: Seq[String], schema: TableSchema): (Seq[String], Map[Int, Int]) = {
    val inSchema = schema.fieldNames.filter(headers.contains)
    val extras = headers.filterNot(schema.fieldNames.contains)
    val ordered = inSchema ++ extras
    val mapping = ordered.zipWithIndex.map { case (h, i) => (i + 1) -> (headers.indexOf(h) + 1) }.toMap
    (ordered, mapping)
  }

  /** Transposition correction (jobs.py:169-171, 399-407): when the table was
    * transposed before validation, every "row"/"column" in the report's
    * messages refers to the opposite axis — swap the wording (the reference
    * does a sentinel regex dance; semantics identical). */
  def swapRowColumnWording(report: ValidationReport): ValidationReport = {
    def swapText(s: String): String =
      s.replaceAll("\\brow\\b", "@@SWAP@@")
        .replaceAll("\\bcolumn\\b", "row")
        .replace("@@SWAP@@", "column")
        .replaceAll("\\bRow\\b", "@@SWAP@@")
        .replaceAll("\\bColumn\\b", "Row")
        .replace("@@SWAP@@", "Column")
    report.copy(tables = report.tables.map { t =>
      t.copy(errors = t.errors.map(e => e.copy(message = swapText(e.message))))
    })
  }

  /** Source hiding (jobs.py:155-160): local paths in tables[].source are
    * replaced by the public URL. */
  def hideSource(report: ValidationReport, publicUrl: String): ValidationReport =
    report.copy(tables = report.tables.map(_.copy(source = publicUrl)))

  /** Zero-table error report (reference ERROR_REPORT shape,
    * tests/helpers.py:85-89; produced at jobs.py:196-200 when the source
    * could not be loaded): error-count 0, table-count 0, warnings carry the
    * failure messages; run status = `error`. */
  def errorReport(warnings: Seq[String]): (ValidationReport, String) =
    (
      ValidationReport(
        valid = false,
        errorCount = 0,
        tableCount = 0,
        time = 0.0,
        warnings = warnings,
        tables = Nil
      ),
      RunStatus.Error
    )
}
