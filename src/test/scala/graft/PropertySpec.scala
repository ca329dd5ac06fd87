package graft

import org.apache.spark.sql.functions._

import graft.runner.{Lineage, ValidationConfig, ValidationRunner}
import graft.schema._

/** Property-style invariants (SURVEY.md §5.6) over seed-generated random
  * tables: the engine's guarantees hold for arbitrary inputs, not just
  * fixtures. (Plain seeded generation — the scalatest/scalacheck bridge
  * artifact is not in the offline cache.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def fc = FieldConstraints()

  private def randomRows(seed: Long): List[(Long, Option[String], Double)] = {
    val r = new scala.util.Random(seed)
    val n = 5 + r.nextInt(40)
    (1 to n).map { i =>
      val s = if (r.nextDouble() < 0.2) None else Some(s"v${r.nextInt(8)}")
      (i.toLong + 1, s, r.nextInt(200).toDouble - 50)
    }.toList
  }

  test("violations(injected) == injected set for any random table") {
    for (seed <- 1L to 6L) {
      val rows = randomRows(seed)
      val df = rows.toDF("_rid", "s", "x")
      val schema = TableSchema(
        Seq(
          Field("s", constraints = fc.copy(required = true)),
          Field("x", "number", constraints = fc.copy(minimum = Some(0)))
        )
      )
      val got = ValidationRunner
        .plan(df, schema, ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema"))))
        .violations
        .collect()
        .map(r => (r.getLong(1), r.getString(0)))
        .toSet
      val expected =
        rows.filter(_._2.isEmpty).map(r => (r._1, "required-constraint")).toSet ++
          rows.filter(_._3 < 0).map(r => (r._1, "minimum-constraint")).toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("report.valid <=> zero errors, status consistent, for any random table") {
    for (seed <- 10L to 14L) {
      val rows = randomRows(seed)
      val df = rows.toDF("_rid", "s", "x")
      val schema = TableSchema(Seq(Field("s", constraints = fc.copy(required = true))))
      val (report, status) = ValidationRunner.run(
        df, schema,
        ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")))
      )
      assert(report.valid == report.tables.head.errors.isEmpty, s"seed=$seed")
      assert(report.valid == (status == "success"), s"seed=$seed")
      assert(report.errorCount == report.tables.head.errors.size, s"seed=$seed")
    }
  }

  test("uniqueness violation count is partitioning-invariant and equals n - distinct") {
    for (seed <- 20L to 23L) {
      val rows = randomRows(seed)
      val schema = TableSchema(Seq(Field("s", constraints = fc.copy(unique = true))))
      val counts = Seq(1, 3, 7).map { p =>
        val df = rows.toDF("_rid", "s", "x").repartition(p)
        ValidationRunner
          .plan(df, schema, ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema"))))
          .violations
          .count()
      }
      assert(counts.distinct.size == 1, s"seed=$seed: $counts")
      val nonNull = rows.flatMap(_._2)
      assert(counts.head == (nonNull.size - nonNull.distinct.size).toLong, s"seed=$seed")
    }
  }

  test("stable partition ids cover [0,P) for any P") {
    for (p <- Seq(1, 2, 7, 16, 63)) {
      val df = (1L to 200L).map(i => Tuple1(s"k$i")).toDF("k")
      val pids = df.select(Lineage.stablePartitionId(col("k"), p)).distinct().collect().map(_.getInt(0))
      assert(pids.forall(x => x >= 0 && x < p), s"P=$p")
    }
  }

  test("column reorder mapping is a permutation pointing at the same headers") {
    for (seed <- 30L to 34L) {
      val r = new scala.util.Random(seed)
      val headers = r.shuffle(('a' to 'h').map(_.toString).toList).take(4 + r.nextInt(4))
      val schema = TableSchema(r.shuffle(headers).take(2).map(Field(_)))
      val (ordered, mapping) = graft.report.PostProcess.schemaOrder(headers, schema)
      assert(ordered.sorted == headers.sorted, s"seed=$seed")
      assert(mapping.keys.toSeq.sorted == (1 to headers.size), s"seed=$seed")
      assert(mapping.values.toSeq.sorted == (1 to headers.size), s"seed=$seed")
      mapping.foreach { case (newPos, origPos) =>
        assert(ordered(newPos - 1) == headers(origPos - 1), s"seed=$seed")
      }
    }
  }

  test("salted uniqueness is bit-identical to unsalted under extreme skew") {
    // 2000 rows, only 3 distinct keys = every row in a hot group
    val rows = (1L to 2000L).map(i => (i + 1, s"k${i % 3}")).toList
    val df = rows.toDF("_rid", "s")
    val schema = TableSchema(Seq(Field("s", constraints = fc.copy(unique = true))))
    def run(salts: Int) = ValidationRunner
      .plan(
        df, schema,
        ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("schema")), uniquenessSalts = salts)
      )
      .violations
      .collect()
      .map(r => (r.getLong(1), r.getString(3)))
      .sortBy(_._1)
      .toSeq
    assert(run(0) == run(16))
    assert(run(16).size == 2000 - 3) // first-occurrence-wins
  }

  test("custom-constraint violation set matches direct evaluation for random expressions") {
    for (seed <- 40L to 44L) {
      val r = new scala.util.Random(seed)
      val rows = (1 to 30).map(i => (i.toLong, r.nextInt(100).toDouble, r.nextInt(100).toDouble)).toList
      val df = rows.toDF("_rid", "a", "b")
      val exprs = Seq("a > b", "a + b >= 100", "a * 2 < b + 50", "a - b != 0")
      val e = exprs(r.nextInt(exprs.size))
      val schema = TableSchema(Seq.empty, customConstraints = Seq(e))
      val got = ValidationRunner
        .plan(df, schema, ValidationConfig(rowNumberCol = "_rid", options = ValidationOptions(checks = Seq("custom"))))
        .violations
        .collect()
        .map(_.getLong(1))
        .toSet
      def eval(a: Double, b: Double): Boolean = e match {
        case "a > b"          => a > b
        case "a + b >= 100"   => a + b >= 100
        case "a * 2 < b + 50" => a * 2 < b + 50
        case "a - b != 0"     => a - b != 0
      }
      val expected = rows.filter(t => !eval(t._2, t._3)).map(_._1).toSet
      assert(got == expected, s"seed=$seed expr=$e")
    }
  }
}
