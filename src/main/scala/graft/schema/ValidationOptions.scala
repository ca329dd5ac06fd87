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
}
