package graft.checks

import graft.report.{ErrorSpec, Violation}
import graft.schema.{TableSchema, ValidationOptions}

/** Header (context=head) checks. In Spark the header is table metadata
  * (`df.columns` / StructType), not a data row, so these are pure driver-side
  * diffs — no job is launched. Semantics per the reference spec:
  * blank-header / duplicate-header (custom_checks.py:433-456),
  * non-matching-header / extra-header / missing-header
  * (custom_checks.py:515-546), honouring `require_field_order`
  * (jobs.py:127-129: when false, columns are reordered to schema order before
  * the positional comparison — equivalently, positional mismatch is only an
  * error for fields absent from the header entirely).
  */
object HeaderChecks {

  def violations(
      headers: Seq[String],
      schema: TableSchema,
      options: ValidationOptions = ValidationOptions.default
  ): Seq[Violation] = {
    val out = Seq.newBuilder[Violation]
    def add(code: String, columnNumber: Option[Int], subs: Map[String, String]): Unit =
      out += Violation(
        ErrorSpec.reportCode(code),
        rowNumber = None,
        columnNumber = columnNumber,
        message = ErrorSpec.render(code, subs),
        row = Nil
      )

    if (options.enabled("blank-header", "structure"))
      headers.zipWithIndex.foreach { case (h, i) =>
        if (h == null || h.trim.isEmpty)
          add("blank-header", Some(i + 1), Map("column_number" -> (i + 1).toString))
      }

    if (options.enabled("duplicate-header", "structure")) {
      val seen = collection.mutable.Map[String, List[Int]]()
      headers.zipWithIndex.foreach { case (h, i) =>
        val prev = seen.getOrElse(h, Nil)
        if (prev.nonEmpty)
          add(
            "duplicate-header",
            Some(i + 1),
            Map(
              "column_number" -> (i + 1).toString,
              "column_numbers" -> prev.reverse.mkString(", ")
            )
          )
        seen(h) = (i + 1) :: prev
      }
    }

    val fieldNames = schema.fieldNames

    if (options.enabled("non-matching-header", "schema")) {
      if (schema.requireFieldOrder) {
        headers.zip(fieldNames).zipWithIndex.foreach { case ((h, f), i) =>
          if (h != f && fieldNames.contains(h))
            add(
              "non-matching-header",
              Some(i + 1),
              Map("column_number" -> (i + 1).toString, "field_name" -> f)
            )
        }
      }
      // require_field_order=false: reference reorders columns to schema order
      // (jobs.py:489-525) so positional mismatches vanish; only extra/missing
      // remain.
    }

    if (options.enabled("extra-header", "schema"))
      headers.zipWithIndex.foreach { case (h, i) =>
        if (!fieldNames.contains(h))
          add("extra-header", Some(i + 1), Map("column_number" -> (i + 1).toString))
      }

    if (options.enabled("missing-header", "schema"))
      fieldNames.zipWithIndex.foreach { case (f, i) =>
        if (!headers.contains(f))
          add("missing-header", Some(i + 1), Map("column_number" -> (i + 1).toString))
      }

    out.result()
  }
}
