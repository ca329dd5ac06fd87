package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

/** Schema-parser acceptance matrix — mirrors the reference's
  * resource_schema_validator tests (tests/test_validators.py:14-121). */
class TableSchemaSpec extends AnyFunSuite {

  test("valid descriptor parses with fields, types, constraints") {
    val json =
      """{
        |  "fields": [
        |    {"name": "id", "type": "integer", "constraints": {"required": true, "unique": true}},
        |    {"name": "date", "type": "date", "format": "%d/%m/%Y"},
        |    {"name": "amount", "type": "number", "constraints": {"minimum": 0, "maximum": 100}},
        |    {"name": "cat", "constraints": {"enum": ["a", "b"], "minLength": 1, "maxLength": 10, "pattern": "^[ab]$"}}
        |  ],
        |  "primaryKey": ["id"],
        |  "customConstraints": ["amount > 0"],
        |  "naValue": "NA",
        |  "require_field_order": false,
        |  "transpose": false
        |}""".stripMargin
    val s = TableSchema.parse(json).toOption.get
    assert(s.fields.map(_.name) == Seq("id", "date", "amount", "cat"))
    assert(s.fields.head.constraints.required && s.fields.head.constraints.unique)
    assert(s.field("date").get.format.contains("%d/%m/%Y"))
    assert(s.field("amount").get.constraints.minimum.contains(0.0))
    assert(s.field("amount").get.constraints.maximum.contains(100.0))
    assert(s.field("cat").get.constraints.enumVals.contains(Seq("a", "b")))
    assert(s.field("cat").get.constraints.pattern.contains("^[ab]$"))
    assert(s.primaryKey == Seq("id"))
    assert(s.customConstraints == Seq("amount > 0"))
    assert(s.naValue.contains("NA"))
    assert(!s.requireFieldOrder)
  }

  test("descriptor without fields is a schema-error ('fields' is a required property)") {
    val err = TableSchema.parse("""{"primaryKey": "id"}""").swap.toOption.get
    assert(err.message.contains("'fields' is a required property"))
  }

  test("non-object descriptor rejected") {
    assert(TableSchema.parse("""[1,2]""").isLeft)
    assert(TableSchema.parse("""not json""").isLeft)
  }

  test("primaryKey accepts string or array (Table Schema spec)") {
    val s1 = TableSchema.parse("""{"fields":[{"name":"a"}],"primaryKey":"a"}""").toOption.get
    val s2 = TableSchema.parse("""{"fields":[{"name":"a"}],"primaryKey":["a"]}""").toOption.get
    assert(s1.primaryKey == Seq("a") && s2.primaryKey == Seq("a"))
  }

  test("foreignKey forms: inline values, table ref, NOTFOUND sentinel") {
    val s = TableSchema
      .parse("""{"fields":[
        |{"name":"x","foreignKey":["1","2"]},
        |{"name":"y","foreignKey":"resid:col"},
        |{"name":"z","foreignKey":"NOTFOUND: missing"}
        |]}""".stripMargin)
      .toOption
      .get
    assert(s.field("x").get.foreignKey.contains(InlineValues(Seq("1", "2"))))
    assert(s.field("y").get.foreignKey.contains(TableRef("resid", "col")))
    assert(s.field("z").get.foreignKey.contains(NotFoundRef))
  }

  test("options merge: per-table wins over defaults (test_validators.py:112-121)") {
    val merged = ValidationOptions.merge(
      Map("row_limit" -> 1000, "skip_checks" -> Seq("x")),
      Map("row_limit" -> 10)
    )
    assert(merged("row_limit") == 10)
    assert(merged("skip_checks") == Seq("x"))
  }

  test("enabled(): group/code selection and skip_checks") {
    val o = ValidationOptions(checks = Seq("schema"), skipChecks = Seq("pattern-constraint"))
    assert(o.enabled("required-constraint", "schema"))
    assert(!o.enabled("pattern-constraint", "schema"))
    assert(!o.enabled("blank-row", "structure"))
    assert(ValidationOptions(checks = Seq("blank-row")).enabled("blank-row", "structure"))
  }
}
