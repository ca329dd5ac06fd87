package graft

import graft.runner.{ValidationConfig, ValidationRunner}
import graft.schema._

/** Referential checks — broadcast/anti-join semantics mirroring the
  * reference's ForeignKeyCheck (custom_checks.py:206-329). */
class ForeignKeySpec extends SparkSpec {
  import spark.implicits._

  test("table-ref FK: rows whose value is missing from the dimension") {
    val fact = Seq((2L, 1), (3L, 2), (4L, 99)).toDF("_rid", "area")
    val dim = Seq(1, 2, 3).toDF("code")
    val schema = TableSchema(Seq(Field("area", "integer", foreignKey = Some(TableRef("areas", "code")))))
    val v = ValidationRunner
      .plan(
        fact,
        schema,
        ValidationConfig(rowNumberCol = "_rid", dims = Map("areas" -> dim), broadcastDims = true)
      )
      .violations
      .collect()
    assert(v.map(_.getLong(1)).toSeq == Seq(4L))
    assert(v.head.getString(0) == "foreign-key")
    assert(v.head.getString(3) == "Value in column 1 and row 4 is not found in the referenced data table: areas")
  }

  test("inline-values FK compiles to isin (no shuffle, row-scoped)") {
    val fact = Seq((2L, "x"), (3L, "nope")).toDF("_rid", "v")
    val schema = TableSchema(Seq(Field("v", foreignKey = Some(InlineValues(Seq("x", "y"))))))
    val v = ValidationRunner
      .plan(fact, schema, ValidationConfig(rowNumberCol = "_rid"))
      .violations
      .collect()
    assert(v.map(_.getLong(1)).toSeq == Seq(3L))
  }

  test("unresolvable reference: ONE 'No foreign-key reference found' error (custom_checks.py:244-252)") {
    val fact = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("_rid", "area")
    val schema = TableSchema(Seq(Field("area", "integer", foreignKey = Some(TableRef("gone", "code")))))
    val v = ValidationRunner
      .plan(fact, schema, ValidationConfig(rowNumberCol = "_rid", dims = Map.empty))
      .violations
      .collect()
    assert(v.length == 1)
    assert(v.head.getLong(1) == 2L)
    assert(v.head.getString(3) == "No foreign-key reference found. Does the referenced resource exist?")
  }

  test("null FK value counts as a miss (reference stringifies None)") {
    val fact = Seq((2L, Some(1)), (3L, None)).toDF("_rid", "area")
    val dim = Seq(1).toDF("code")
    val schema = TableSchema(Seq(Field("area", "integer", foreignKey = Some(TableRef("areas", "code")))))
    val v = ValidationRunner
      .plan(
        fact,
        schema,
        ValidationConfig(rowNumberCol = "_rid", dims = Map("areas" -> dim), options = ValidationOptions(checks = Seq("schema")))
      )
      .violations
      .collect()
    assert(v.map(_.getLong(1)).toSeq == Seq(3L))
  }
}
