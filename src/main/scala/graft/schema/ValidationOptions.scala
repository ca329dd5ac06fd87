package graft.schema

/** Run options, mirroring the reference's `validation_options` surface
  * (reference: ckanext/validation/validators.py:49-68 for the resource-wins
  * merge, jobs.py:54-65 for the defaults merge, README.md:225-250 for the
  * documented keys). Only the keys that affect check semantics are modeled;
  * dialect/encoding keys belong to the source reader.
  *
  * `checks` selects enabled check groups or individual codes (jobs.py:107 sets
  * `['structure', 'schema']`); `skipChecks` removes individual codes
  * (README.md:242-250); `rowLimit` bounds the scanned rows and emits the
  * "Table inspection has reached N row(s) limit" warning
  * (tests/test_jobs.py:233-235).
  */
final case class ValidationOptions(
    checks: Seq[String] = Seq("structure", "schema", "custom"),
    skipChecks: Seq[String] = Nil,
    rowLimit: Option[Long] = None,
    /** cap on collected error entries per code in the final report. The
      * DEFAULT is bounded: goodtables runs with an error limit (1000) and the
      * reference CLI caps at 10/type (commands.py:215) — an unbounded default
      * would collect every violation to the driver (1% of 10^12 rows = OOM).
      * None = explicit opt-out for small fixtures. Plans from `plan()` and
      * lineage sinks are never capped — only the driver-side report is. */
    errorLimitPerCode: Option[Int] = Some(1000)
) {

  /** Is check `code` (member of `group`) enabled? A code is enabled when its
    * group or the code itself is listed in `checks` and the code is not in
    * `skipChecks`. */
  def enabled(code: String, group: String): Boolean =
    (checks.contains(group) || checks.contains(code)) && !skipChecks.contains(code)
}

object ValidationOptions {
  val default: ValidationOptions = ValidationOptions()

  /** Resource options win over configured defaults
    * (asserted tests/test_validators.py:112-121). */
  def merge(defaults: Map[String, Any], perTable: Map[String, Any]): Map[String, Any] =
    defaults ++ perTable

  /** The reference's `validation_options` ACCEPTANCE surface
    * (validators.py:49-68): a JSON object, or a JSON string encoding one —
    * anything else (arrays, numbers, junk strings) is rejected with an
    * error, never silently coerced. Unknown keys are ignored (the reference
    * passes them through to goodtables). */
  def parse(raw: String): Either[String, ValidationOptions] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def fromJson(o: JObject): ValidationOptions = {
      val m = o.obj.toMap
      def strings(k: String): Option[Seq[String]] = m.get(k).collect { case JArray(xs) =>
        xs.collect { case JString(s) => s }
      }
      ValidationOptions(
        checks = strings("checks").getOrElse(default.checks),
        skipChecks = strings("skip_checks").getOrElse(Nil),
        rowLimit = m.get("row_limit").collect { case JInt(n) => n.toLong },
        errorLimitPerCode = m.get("error_limit_per_code") match {
          case Some(JInt(n))  => Some(n.toInt)
          case Some(JNull)    => None // explicit opt-out
          case _              => default.errorLimitPerCode
        }
      )
    }
    try JsonMethods.parse(raw) match {
      case o: JObject => Right(fromJson(o))
      case JString(s) => // a JSON string ENCODING an object (form-field case)
        try JsonMethods.parse(s) match {
          case o: JObject => Right(fromJson(o))
          case _          => Left("validation_options must be a JSON object")
        } catch { case _: Exception => Left("JSON Decode Error: Invalid JSON validation options") }
      case _ => Left("validation_options must be a JSON object")
    } catch { case _: Exception => Left("JSON Decode Error: Invalid JSON validation options") }
  }
}
