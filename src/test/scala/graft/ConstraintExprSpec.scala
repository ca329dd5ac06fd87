package graft

import org.apache.spark.sql.functions._
import graft.exprs.ConstraintExpr

/** Custom-constraint semantics, mirroring the reference's check-level tests
  * (tests/test_custom_checks.py:9-53) with the same inline tables and the
  * same expected (row, code) tuples. */
class ConstraintExprSpec extends SparkSpec {
  import spark.implicits._

  private def failingRows(df: org.apache.spark.sql.DataFrame, constraint: String): Seq[Long] = {
    val cond = ConstraintExpr.compileViolation(constraint, df.columns.toSeq.filterNot(_ == "_rid"))
    df.filter(cond).select("_rid").collect().map(_.getLong(0)).sorted.toSeq
  }

  test("salary > bonus * 4 fails rows 4 and 6 (test_custom_checks.py:9-24)") {
    val df = Seq(
      (2L, 1000, 200),
      (3L, 2500, 500),
      (4L, 1300, 500),
      (5L, 5000, 1000),
      (6L, 6000, 2000)
    ).toDF("_rid", "salary", "bonus")
    assert(failingRows(df, "salary > bonus * 4") == Seq(4L, 6L))
  }

  test("rows with missing referenced data are skipped, not failed (test_custom_checks.py:27-42)") {
    val df = Seq(
      (1L, None, Some(500)),
      (2L, Some(5000), None),
      (3L, None, None)
    ).toDF("_rid", "salary", "bonus")
    assert(failingRows(df, "salary > bonus * 4") == Seq.empty)
  }

  test("non-numeric cells are skipped like missing ones (float-coercion semantics)") {
    val df = Seq((1L, "abc", "500"), (2L, "100", "50")).toDF("_rid", "salary", "bonus")
    // row 1: salary not float-coercible -> skip; row 2: 100 > 200 false -> fail
    assert(failingRows(df, "salary > bonus * 4") == Seq(2L))
  }

  test("malformed/malicious expressions fail every row, not crash (test_custom_checks.py:44-53)") {
    val df = Seq((2L, "Alex")).toDF("_rid", "name")
    assert(failingRows(df, "vars()") == Seq(2L))
    assert(failingRows(df, "import(os)") == Seq(2L))
    assert(failingRows(df, "salary >") == Seq(2L))
  }

  test("unknown identifier means NameNotDefined means skip") {
    val df = Seq((1L, 10)).toDF("_rid", "a")
    assert(failingRows(df, "nosuchcol > 5") == Seq.empty)
  }

  test("grammar: precedence, parens, unary minus, and/or/not, comparisons") {
    val df = Seq((1L, 2.0, 3.0), (2L, 10.0, 1.0)).toDF("_rid", "a", "b")
    assert(failingRows(df, "a + b * 2 > 8") == Seq(1L)) // row1: 2+6=8, not >8 -> fails
    assert(failingRows(df, "(a + b) * 2 >= 11") == Seq(1L))
    assert(failingRows(df, "-a < 0") == Seq.empty)
    assert(failingRows(df, "a > 1 and b > 2") == Seq(2L))
    assert(failingRows(df, "a > 5 or b > 2") == Seq.empty)
    assert(failingRows(df, "not (a > 5)") == Seq(2L))
    assert(failingRows(df, "a != 2") == Seq(1L))
    assert(failingRows(df, "a == 2") == Seq(2L))
    assert(failingRows(df, "a % 2 == 0") == Seq.empty)
  }

  test("not binds looser than comparisons (Python): not a > 5 == not(a > 5)") {
    val df = Seq((1L, 2.0, 3.0), (2L, 10.0, 1.0)).toDF("_rid", "a", "b")
    // constraint `not a > 5` holds for row 1 (a<=5), fails for row 2
    assert(failingRows(df, "not a > 5") == Seq(2L))
    // ...but still binds tighter than `and`
    assert(failingRows(df, "not a > 5 and b > 0") == Seq(2L))
  }

  test("not/and/or over non-boolean operands use Python truthiness, not an analysis crash") {
    val df = Seq((1L, 0.0, 3.0), (2L, 10.0, 0.0)).toDF("_rid", "a", "b")
    assert(failingRows(df, "not a") == Seq(2L))      // not 0.0 is True
    assert(failingRows(df, "a and b") == Seq(1L, 2L)) // 0 and 3 / 10 and 0 both falsy
    assert(failingRows(df, "a or b") == Seq.empty)
  }

  test("division by zero fails the row (reference: eval exception -> error)") {
    val df = Seq((1L, 10.0, 0.0)).toDF("_rid", "a", "b")
    assert(failingRows(df, "a / b > 1") == Seq(1L))
  }
}
