package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Frictionless Table Schema descriptor AST.
  *
  * Mirrors the acceptance surface of the reference's schema handling
  * (reference: ckanext/validation/validators.py:11-46, jobs.py:101-138) plus the
  * fork-specific extensions: `customConstraints` (jobs.py:108-113), `transpose`
  * (jobs.py:122-123), `require_field_order` (jobs.py:128-129), `naValue`
  * (jobs.py:132-133), and per-field `foreignKey` (jobs.py:441-486).
  *
  * The descriptor is dynamic/external (never inferred); parsing returns
  * `Either[SchemaError, TableSchema]` so that an invalid descriptor becomes a
  * single `schema-error` violation before any job runs (validators.py:36-44).
  */
final case class FieldConstraints(
    required: Boolean = false,
    unique: Boolean = false,
    enumVals: Option[Seq[String]] = None,
    minimum: Option[Double] = None,
    maximum: Option[Double] = None,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    pattern: Option[String] = None
)

/** One schema field. `ftype` ∈ {string, integer, number, date, boolean, any};
  * `format` is a strptime-style date format when ftype == date
  * (reference README.md:171-204 uses "%d/%m/%Y").
  * `foreignKey` holds either resolved inline valid values or a
  * "resourceId:field" pointer (custom_checks.py:270-312).
  */
final case class Field(
    name: String,
    ftype: String = "string",
    format: Option[String] = None,
    constraints: FieldConstraints = FieldConstraints(),
    foreignKey: Option[ForeignKeyRef] = None
)

sealed trait ForeignKeyRef
/** Values enumerated inline in the descriptor (same-table FK resolution,
  * reference jobs.py:465-466). */
final case class InlineValues(values: Seq[String]) extends ForeignKeyRef
/** Pointer to another table's column ("resourceId:field" string form,
  * reference custom_checks.py:287-296); resolved to a dimension DataFrame at
  * plan time. */
final case class TableRef(table: String, field: String) extends ForeignKeyRef
/** Reference table could not be resolved → single "No foreign-key reference
  * found" violation (reference custom_checks.py:244-252, jobs.py:478-481). */
case object NotFoundRef extends ForeignKeyRef

final case class SchemaError(message: String)

final case class TableSchema(
    fields: Seq[Field],
    primaryKey: Seq[String] = Nil,
    customConstraints: Seq[String] = Nil,
    naValue: Option[String] = None,
    requireFieldOrder: Boolean = true,
    transpose: Boolean = false
) {
  def field(name: String): Option[Field] = fields.find(_.name == name)
  def fieldNames: Seq[String] = fields.map(_.name)
}

object TableSchema {

  /** Parse a Table Schema JSON descriptor. Accepts the same surface as the
    * reference's `resource_schema_validator` (validators.py:11-46): an object
    * with a required `fields` array; rejects non-objects and descriptors
    * without `fields` with a `schema-error`-style message.
    */
  def parse(json: String): Either[SchemaError, TableSchema] = {
    val parsed =
      try Right(JsonMethods.parse(json))
      catch { case e: Exception => Left(SchemaError(s"Invalid JSON: ${e.getMessage}")) }
    parsed.flatMap {
      case obj: JObject => fromJValue(obj)
      case _            => Left(SchemaError("Schema descriptor must be a JSON object"))
    }
  }

  def fromJValue(obj: JObject): Either[SchemaError, TableSchema] = {
    val m = obj.obj.toMap
    m.get("fields") match {
      case None => Left(SchemaError("'fields' is a required property"))
      case Some(JArray(fs)) =>
        val fields = fs.map(parseField)
        fields.collectFirst { case Left(e) => e } match {
          case Some(err) => Left(err)
          case None =>
            Right(
              TableSchema(
                fields = fields.collect { case Right(f) => f },
                primaryKey = strOrSeq(m.get("primaryKey")),
                customConstraints = strOrSeq(m.get("customConstraints")),
                naValue = str(m.get("naValue")),
                requireFieldOrder = bool(m.get("require_field_order")).getOrElse(true),
                transpose = bool(m.get("transpose")).getOrElse(false)
              )
            )
        }
      case Some(_) => Left(SchemaError("'fields' must be an array"))
    }
  }

  private def parseField(j: JValue): Either[SchemaError, Field] = j match {
    case JObject(kv) =>
      val m = kv.toMap
      str(m.get("name")) match {
        case None => Left(SchemaError("Field is missing a 'name' property"))
        case Some(name) =>
          val cs = m.get("constraints") match {
            case Some(JObject(ckv)) => parseConstraints(ckv.toMap)
            case _                  => FieldConstraints()
          }
          val fk = m.get("foreignKey") match {
            case Some(JArray(vs))  => Some(InlineValues(vs.map(jString)))
            case Some(JString(s)) =>
              if (s.startsWith("NOTFOUND")) Some(NotFoundRef)
              else
                s.split(":", 2) match {
                  case Array(t, f) => Some(TableRef(t, f))
                  case _           => Some(NotFoundRef)
                }
            case _ => None
          }
          Right(
            Field(
              name = name,
              ftype = str(m.get("type")).getOrElse("string"),
              format = str(m.get("format")),
              constraints = cs,
              foreignKey = fk
            )
          )
      }
    case _ => Left(SchemaError("Each field must be a JSON object"))
  }

  private def parseConstraints(m: Map[String, JValue]): FieldConstraints =
    FieldConstraints(
      required = bool(m.get("required")).getOrElse(false),
      unique = bool(m.get("unique")).getOrElse(false),
      enumVals = m.get("enum").collect { case JArray(vs) => vs.map(jString) },
      minimum = num(m.get("minimum")),
      maximum = num(m.get("maximum")),
      minLength = num(m.get("minLength")).map(_.toInt),
      maxLength = num(m.get("maxLength")).map(_.toInt),
      pattern = str(m.get("pattern"))
    )

  private def jString(v: JValue): String = v match {
    case JString(s)  => s
    case JInt(i)     => i.toString
    case JLong(l)    => l.toString
    case JDouble(d)  => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case JDecimal(d) => d.toString
    case JBool(b)    => b.toString
    case _           => v.toString
  }

  private def str(v: Option[JValue]): Option[String] = v.collect { case JString(s) => s }
  private def bool(v: Option[JValue]): Option[Boolean] = v.collect { case JBool(b) => b }
  private def num(v: Option[JValue]): Option[Double] = v.collect {
    case JInt(i)     => i.toDouble
    case JLong(l)    => l.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JString(s) if s.nonEmpty && s.forall(c => c.isDigit || c == '.' || c == '-') => s.toDouble
  }
  private def strOrSeq(v: Option[JValue]): Seq[String] = v match {
    case Some(JString(s)) => Seq(s)
    case Some(JArray(vs)) => vs.map(jString)
    case _                => Nil
  }
}
