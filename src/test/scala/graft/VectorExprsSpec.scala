package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.exprs.VectorExprs

/** Native Catalyst vector expressions: value parity with the UDF kernels,
  * whole-stage codegen participation, SQL registration. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = (0 until n).map { i =>
    (i.toLong, Seq.tabulate(24)(d => math.sin(i * 7 + d * 3)))
  }.toDF("id", "v")

  test("dot/l2norm/cosine: bit-identical to the UDF kernels") {
    val df = vecs(200).withColumn("w", expr("transform(v, x -> x * 0.75 + 0.1)"))
    val rows = df.select(
      VectorExprs.dotNative(col("v"), col("w")).as("dn"),
      Ann.dotViaUdf(col("v"), col("w")).as("du"),
      VectorExprs.l2normNative(col("v")).as("nn"),
      Ann.l2normViaUdf(col("v")).as("nu"),
      VectorExprs.cosineNative(col("v"), col("w")).as("cn"),
      Ann.cosineViaUdf(col("v"), col("w")).as("cu")
    ).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // same loop order -> same bits
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getDouble(4) == r.getDouble(5))
    }
  }

  test("null array -> null; mismatched lengths use the common prefix") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)),
      (2L, null.asInstanceOf[Seq[Double]], Seq(1.0))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorExprs.dotNative(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(got(0).getDouble(1) == 1.0 * 4.0 + 2.0 * 5.0)
    assert(got(1).isNullAt(1))
  }

  test("the projection stays inside WholeStageCodegen (no UDF fence)") {
    // a real scan (LocalRelation would be constant-folded through the
    // interpreted eval path and leave nothing to codegen)
    val path = java.nio.file.Files.createTempDirectory("graft_vexpr").toString + "/v"
    vecs(50).write.parquet(path)
    val df = spark.read.parquet(path)
    val plan = df.select(VectorExprs.dotNative(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(!plan.contains("UDF("), s"native expr must not fall back to a UDF:\n$plan")
    // interpreted fallback also works (eval path): force by collecting via expression eval
    val e = VectorExprs.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    )
    assert(e.eval(null) == 11.0)
  }

  test("LshSignature: bit-identical to the per-bit dot composition, codegen'd at 24 bits") {
    val planes = Ann.hyperplanes(24, 24, seed = 9)
    val df = vecs(300)
    // reference composition (the shape the native expression replaced)
    val composed = planes.zipWithIndex
      .map { case (p, i) =>
        val pc = array(p.map(lit): _*)
        when(VectorExprs.dotNative(col("v"), pc) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      .reduce((a, b) => a.bitwiseOR(b))
    val rows = df.select(
      VectorExprs.lshSignatureNative(col("v"), planes).as("native"),
      composed.as("composed")
    ).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // the single-expression form stays inside WholeStageCodegen on a real scan
    val path = java.nio.file.Files.createTempDirectory("graft_lsig").toString + "/v"
    df.write.parquet(path)
    val plan = spark.read.parquet(path)
      .select(VectorExprs.lshSignatureNative(col("v"), planes).as("sig"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_lsh_sig"), plan)
  }

  test("SQL registration: graft_dot / graft_l2norm callable from spark.sql") {
    VectorExprs.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, graft_l2norm(array(3.0D, 4.0D)) AS n"
    ).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
    VectorExprs.register(spark) // idempotent re-registration
  }

  test("GraftExtensions applies cleanly to a SparkSessionExtensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.exprs.GraftExtensions().apply(ext) // builders shared with register()
  }

  test("LshSignature: structural equality (canonicalization / CSE / exchange reuse)") {
    // planes held as Seq — two independently-built but semantically identical
    // expressions must compare equal (an Array param compares by reference,
    // which silently defeats common-subexpression elimination)
    import org.apache.spark.sql.catalyst.expressions.Literal
    def planes() = Seq(Seq(1.0, -2.0, 3.0), Seq(-0.5, 0.25, 4.0))
    val child = Literal.create(Seq(1.0, 2.0, 3.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    val e1 = VectorExprs.LshSignature(child, planes())
    val e2 = VectorExprs.LshSignature(child, planes())
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
    // and the math is unchanged
    assert(e1.eval(null) == e2.eval(null))
  }
}
