package graft.report

/** The complete error-code vocabulary of the engine, with message templates,
  * type, context, and weight — content-identical to the reference's spec
  * override (reference: ckanext/validation/custom_checks.py:370-680).
  *
  * Templates use `{placeholder}` substitution exactly as goodtables does, so
  * violation messages are byte-identical to the reference's report entries.
  */
final case class ErrorDef(code: String, errType: String, context: String, weight: Int, template: String)

object ErrorSpec {

  val all: Seq[ErrorDef] = Seq(
    // source-level (context=table)
    ErrorDef("io-error", "source", "table", 100, "The data source returned an IO Error of type {error_type}"),
    ErrorDef("http-error", "source", "table", 100, "The data source returned an HTTP error with a status code of {status_code}"),
    ErrorDef("source-error", "source", "table", 100, "The data source has not supported or has inconsistent contents; no tabular data can be extracted"),
    ErrorDef("scheme-error", "source", "table", 100, "The data source is in an unknown scheme; no tabular data can be extracted"),
    ErrorDef("format-error", "source", "table", 100, "The data source is in an unknown format; no tabular data can be extracted"),
    ErrorDef("encoding-error", "source", "table", 100, "The data source could not be successfully decoded with {encoding} encoding"),
    // structure
    ErrorDef("blank-header", "structure", "head", 3, "Header in column {column_number} is blank"),
    ErrorDef("duplicate-header", "structure", "head", 3, "Header in column {column_number} is duplicated to header in column(s) {column_numbers}"),
    ErrorDef("blank-row", "structure", "body", 9, "Row {row_number} is completely blank"),
    ErrorDef("duplicate-row", "structure", "body", 5, "Row {row_number} is duplicated to row(s) {row_numbers}"),
    ErrorDef("extra-value", "structure", "body", 9, "Row {row_number} has an extra value in column {column_number}"),
    ErrorDef("missing-value", "structure", "body", 9, "Row {row_number} has a missing value in column {column_number}"),
    // schema head
    ErrorDef("schema-error", "schema", "table", 15, "Table Schema error: {error_message}"),
    ErrorDef("non-matching-header", "schema", "head", 9, "Header in column {column_number} doesn't match field name {field_name} in the schema"),
    ErrorDef("extra-header", "schema", "head", 9, "There is an extra header in column {column_number}"),
    ErrorDef("missing-header", "schema", "head", 9, "There is a missing header in column {column_number}"),
    // schema body
    ErrorDef("type-or-format-error", "schema", "body", 9, "The value {value} in row {row_number} and column {column_number} is not type {field_type} and format {field_format}"),
    ErrorDef("required-constraint", "schema", "body", 9, "Column {column_number} is a required field, but row {row_number} has no value"),
    ErrorDef("pattern-constraint", "schema", "body", 7, "The value {value} in row {row_number} and column {column_number} does not conform to the pattern constraint of {constraint}"),
    ErrorDef("unique-constraint", "schema", "body", 9, "Rows {row_numbers} has unique constraint violation in column {column_number}"),
    ErrorDef("unique-constraint-composite", "schema", "body", 9, "Rows {row_numbers} have a composite uniqueness constraint violation. Primary key fields ({primary_key_fields}) must form a unique combination in the dataset."),
    ErrorDef("enumerable-constraint", "schema", "body", 7, "The value {value} in row {row_number} and column {column_number} is not found in the list of valid values for this field: {constraint}"),
    ErrorDef("minimum-constraint", "schema", "body", 7, "The value {value} in row {row_number} and column {column_number} does not conform to the minimum constraint of {constraint}"),
    ErrorDef("maximum-constraint", "schema", "body", 7, "The value {value} in row {row_number} and column {column_number} does not conform to the maximum constraint of {constraint}"),
    ErrorDef("minimum-length-constraint", "schema", "body", 7, "The value {value} in row {row_number} and column {column_number} does not conform to the minimum length constraint of {constraint}"),
    ErrorDef("maximum-length-constraint", "schema", "body", 7, "The value {value} in row {row_number} and column {column_number} does not conform to the maximum length constraint of {constraint}"),
    ErrorDef("missing-geometry", "schema", "body", 7, "There is no geometry specified for row {row_number}."),
    ErrorDef("foreign-key", "schema", "body", 7, "Value in column {column_number} and row {row_number} is not found in the referenced data table: {resource_id}"),
    ErrorDef("foreign-key-notfound", "schema", "body", 7, "No foreign-key reference found. Does the referenced resource exist?"),
    ErrorDef("custom-constraint", "custom", "body", 7, "Custom constraint \"{constraint}\" fails for row {row_number}")
  )

  private val byCode: Map[String, ErrorDef] = all.map(d => d.code -> d).toMap

  /** Canonical code emitted in reports: the internal `-composite` / `-notfound`
    * variants share their parent code (they exist only to carry a distinct
    * message template, exactly like the reference's message override). */
  def reportCode(code: String): String = code match {
    case "unique-constraint-composite" => "unique-constraint"
    case "foreign-key-notfound"        => "foreign-key"
    case other                         => other
  }

  def apply(code: String): ErrorDef = byCode(code)
  def template(code: String): String = byCode(code).template
  def group(code: String): String = byCode(code).errType

  /** Driver-side template render (for header/table-level errors built on the
    * driver; row-level messages are rendered in-plan via Catalyst concat). */
  def render(code: String, subs: Map[String, String]): String =
    subs.foldLeft(template(code)) { case (msg, (k, v)) => msg.replace("{" + k + "}", v) }

  /** Split a template into literal and `{placeholder}` pieces, preserving
    * order — used to compile messages to a Catalyst `concat`. */
  def pieces(code: String): Seq[Either[String, String]] = {
    val t = template(code)
    val out = Seq.newBuilder[Either[String, String]]
    var i = 0
    while (i < t.length) {
      val open = t.indexOf('{', i)
      if (open < 0) { out += Left(t.substring(i)); i = t.length }
      else {
        if (open > i) out += Left(t.substring(i, open))
        val close = t.indexOf('}', open)
        out += Right(t.substring(open + 1, close))
        i = close + 1
      }
    }
    out.result()
  }
}
